"""Pure-Python PDF extraction kernel (runs inside Arrow batch UDFs).

Modules mirror the reference pipeline stages (SURVEY.md section 2):
objects -> filters -> xref -> pagetree -> encoding -> content ->
layout/structtree -> document.
"""

from .document import Document, PageNotFoundError, decode_pdf_string  # noqa: F401
from .objects import Name, Ref, Stream, Parser, ParseError  # noqa: F401
