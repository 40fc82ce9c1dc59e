"""Geometric ordering & layout analysis over text spans.

Fresh Python implementation matching /root/reference/src/layout.zig:

- sortGeometric (layout.zig:133-206): rows bucketed by int(y0/3), sorted
  row-desc then x-asc; '\\n' between rows (|dy| > 3), ' ' when the
  horizontal gap exceeds 0.2 * prev font size
- analyzeLayout (layout.zig:208-366): two-column detection via span
  mid-x vs half page +/- 5% margin; two-column iff > 1/3 of lines have
  both sides; emission left column then right; line assembly (dy > 10),
  word assembly (gap > 5), paragraph detection (gap > 1.5x avg spacing
  or indent > 15)
- getTextInOrder (layout.zig:67-128): '\\n' on dy > 10, ' ' when gap >
  0.15 * prev font size
"""

from __future__ import annotations

import math
from typing import List, Optional

from .content import TextSpan


def _emit(sorted_spans: List[TextSpan], line_threshold: float, space_factor: float) -> bytes:
    if not sorted_spans:
        return b""
    out = bytearray()
    prev_y = sorted_spans[0].y0
    prev_x1 = sorted_spans[0].x0
    prev_font_size = sorted_spans[0].font_size
    first = True
    for span in sorted_spans:
        if not first:
            if abs(span.y0 - prev_y) > line_threshold:
                out.append(0x0A)
                prev_y = span.y0
            else:
                if span.x0 - prev_x1 > prev_font_size * space_factor:
                    out.append(0x20)
        first = False
        out += span.text
        prev_x1 = span.x1
        prev_font_size = span.font_size
    return bytes(out)


def _row_key(threshold: float):
    def key(s: TextSpan):
        # Zig @intFromFloat truncates toward zero
        row = int(s.y0 / threshold)
        return (-row, s.x0)

    return key


def sort_geometric(spans: List[TextSpan]) -> bytes:
    """Y (top->bottom) then X (left->right); PyMuPDF sort=True analog
    (layout.zig:133-206)."""
    if not spans:
        return b""
    line_threshold = 3.0
    ordered = sorted(spans, key=_row_key(line_threshold))
    return _emit(ordered, line_threshold, 0.2)


class LayoutResult:
    __slots__ = ("spans", "is_two_column")

    def __init__(self, spans: List[TextSpan], is_two_column: bool):
        self.spans = spans
        self.is_two_column = is_two_column

    def get_text_in_order(self) -> bytes:
        return _emit(self.spans, 10.0, 0.15)


def analyze_layout(spans: List[TextSpan], page_width: float) -> LayoutResult:
    """Column-aware ordering (layout.zig:208-366). Only the ordered span
    list and the two-column verdict are materialized; the full
    line/word/paragraph hierarchy of the reference feeds markdown
    rendering and is computed there."""
    if not spans:
        return LayoutResult([], False)
    line_threshold = 10.0
    half_page = page_width / 2
    margin = page_width * 0.05
    ordered = sorted(spans, key=_row_key(line_threshold))

    left_only = right_only = both = 0
    current_y = ordered[0].y0
    has_left = has_right = False
    for span in ordered:
        if abs(span.y0 - current_y) > line_threshold:
            if has_left and has_right:
                both += 1
            elif has_left:
                left_only += 1
            elif has_right:
                right_only += 1
            current_y = span.y0
            has_left = has_right = False
        mid_x = (span.x0 + span.x1) / 2
        if mid_x < half_page - margin:
            has_left = True
        elif mid_x > half_page + margin:
            has_right = True
        else:
            has_left = True  # center -> left
    if has_left and has_right:
        both += 1
    elif has_left:
        left_only += 1
    elif has_right:
        right_only += 1

    total = left_only + right_only + both
    is_two_column = both > total // 3
    if is_two_column:
        left = [s for s in ordered if (s.x0 + s.x1) / 2 < half_page]
        right = [s for s in ordered if (s.x0 + s.x1) / 2 >= half_page]
        result = left + right
    else:
        result = ordered
    return LayoutResult(result, is_two_column)
