"""CFF (Compact Font Format) charset parsing: GID -> glyph name.

Fresh Python implementation matching /root/reference/src/cff.zig —
used as the glyph-name fallback when an embedded Type1C/CIDFontType0C
font (FontDescriptor /FontFile3) carries no ToUnicode CMap
(encoding.zig:299-309, 570-597):

- header (major must be 1), Name/TopDict/String/GlobalSubr INDEXes
  (cff.zig:52-98, 234-300)
- Top DICT operators: 15 charset, 16 encoding, 17 CharStrings,
  18 Private (cff.zig:100-123); DICT number operands incl. shortint
  (28), longint (29), 1-/2-byte biased forms (cff.zig:302-375)
- charset formats 0/1/2 -> GID->SID array; charset_offset 0 =>
  ISOAdobe identity for GIDs 0-228 (cff.zig:125-181)
- SID -> name via the 391 standard strings else the String INDEX
  (cff.zig:183-198, cff_std_strings.zig)

The standard-strings table is public knowledge (CFF spec, Adobe TN
#5176 Appendix A).
"""

from __future__ import annotations

from typing import List, Optional

STD_STRINGS = [
    ".notdef", "space", "exclam", "quotedbl", "numbersign", "dollar", "percent", "ampersand",
    "quoteright", "parenleft", "parenright", "asterisk", "plus", "comma", "hyphen", "period",
    "slash", "zero", "one", "two", "three", "four", "five", "six", "seven", "eight", "nine",
    "colon", "semicolon", "less", "equal", "greater", "question", "at", "A", "B", "C", "D",
    "E", "F", "G", "H", "I", "J", "K", "L", "M", "N", "O", "P", "Q", "R", "S", "T", "U", "V",
    "W", "X", "Y", "Z", "bracketleft", "backslash", "bracketright", "asciicircum", "underscore",
    "quoteleft", "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m", "n", "o",
    "p", "q", "r", "s", "t", "u", "v", "w", "x", "y", "z", "braceleft", "bar", "braceright",
    "asciitilde", "exclamdown", "cent", "sterling", "fraction", "yen", "florin", "section",
    "currency", "quotesingle", "quotedblleft", "guillemotleft", "guilsinglleft", "guilsinglright",
    "fi", "fl", "endash", "dagger", "daggerdbl", "periodcentered", "paragraph", "bullet",
    "quotesinglbase", "quotedblbase", "quotedblright", "guillemotright", "ellipsis", "perthousand",
    "questiondown", "grave", "acute", "circumflex", "tilde", "macron", "breve", "dotaccent",
    "dieresis", "ring", "cedilla", "hungarumlaut", "ogonek", "caron", "emdash", "AE", "ordfeminine",
    "Lslash", "Oslash", "OE", "ordmasculine", "ae", "dotlessi", "lslash", "oslash", "oe",
    "germandbls", "onesuperior", "logicalnot", "mu", "trademark", "Eth", "onehalf", "plusminus",
    "Thorn", "onequarter", "divide", "brokenbar", "degree", "thorn", "threequarters", "twosuperior",
    "registered", "minus", "eth", "multiply", "threesuperior", "copyright", "Aacute", "Acircumflex",
    "Adieresis", "Agrave", "Aring", "Atilde", "Ccedilla", "Eacute", "Ecircumflex", "Edieresis",
    "Egrave", "Iacute", "Icircumflex", "Idieresis", "Igrave", "Ntilde", "Oacute", "Ocircumflex",
    "Odieresis", "Ograve", "Otilde", "Scaron", "Uacute", "Ucircumflex", "Udieresis", "Ugrave",
    "Yacute", "Ydieresis", "Zcaron", "aacute", "acircumflex", "adieresis", "agrave", "aring",
    "atilde", "ccedilla", "eacute", "ecircumflex", "edieresis", "egrave", "iacute", "icircumflex",
    "idieresis", "igrave", "ntilde", "oacute", "ocircumflex", "odieresis", "ograve", "otilde",
    "scaron", "uacute", "ucircumflex", "udieresis", "ugrave", "yacute", "ydieresis", "zcaron",
    "exclamsmall", "Hungarumlautsmall", "dollaroldstyle", "dollarsuperior", "ampersandsmall",
    "Acutesmall", "parenleftsuperior", "parenrightsuperior", "266ff", "onedotenleader",
    "zerooldstyle", "oneoldstyle", "twooldstyle", "threeoldstyle", "fouroldstyle", "fiveoldstyle",
    "sixoldstyle", "sevenoldstyle", "eightoldstyle", "nineoldstyle", "commasuperior",
    "threequartersemdash", "periodsuperior", "questionsmall", "asuperior", "bsuperior",
    "centsuperior", "dsuperior", "esuperior", "isuperior", "lsuperior", "msuperior", "nsuperior",
    "osuperior", "rsuperior", "ssuperior", "tsuperior", "ff", "ffi", "ffl", "parenleftinferior",
    "parenrightinferior", "Circumflexsmall", "hyphensuperior", "Gravesmall", "Asmall", "Bsmall",
    "Csmall", "Dsmall", "Esmall", "Fsmall", "Gsmall", "Hsmall", "Ismall", "Jsmall", "Ksmall",
    "Lsmall", "Msmall", "Nsmall", "Osmall", "Psmall", "Qsmall", "Rsmall", "Ssmall", "Tsmall",
    "Usmall", "Vsmall", "Wsmall", "Xsmall", "Ysmall", "Zsmall", "colonmonetary", "onefitted",
    "rupiah", "Tildesmall", "exclamdownsmall", "centoldstyle", "Lslashsmall", "Scaronsmall",
    "Zcaronsmall", "Dieresissmall", "Brevesmall", "Caronsmall", "Dotaccentsmall", "Macronsmall",
    "figuredash", "hypheninferior", "Ogoneksmall", "Ringsmall", "Cedillasmall", "questiondownsmall",
    "oneeighth", "threeeighths", "fiveeighths", "seveneighths", "onethird", "twothirds",
    "zerosuperior", "foursuperior", "fivesuperior", "sixsuperior", "sevensuperior", "eightsuperior",
    "ninesuperior", "zeroinferior", "oneinferior", "twoinferior", "threeinferior", "fourinferior",
    "fiveinferior", "sixinferior", "seveninferior", "eightinferior", "nineinferior", "centinferior",
    "dollarinferior", "periodinferior", "commainferior", "Agravesmall", "Aacutesmall",
    "Acircumflexsmall", "Atildesmall", "Adieresissmall", "Aringsmall", "AEsmall", "Ccedillasmall",
    "Egravesmall", "Eacutesmall", "Ecircumflexsmall", "Edieresissmall", "Igravesmall",
    "Iacutesmall", "Icircumflexsmall", "Idieresissmall", "Ethsmall", "Ntildesmall", "Ogravesmall",
    "Oacutesmall", "Ocircumflexsmall", "Otildesmall", "Odieresissmall", "OEsmall", "Oslashsmall",
    "Ugravesmall", "Uacutesmall", "Ucircumflexsmall", "Udieresissmall", "Yacutesmall", "Thornsmall",
    "Ydieresissmall", "001.000", "001.001", "001.002", "001.003", "Black", "Bold", "Book", "Light",
    "Medium", "Regular", "Roman", "Semibold",
]


class CffError(Exception):
    pass


class _Index:
    __slots__ = ("count", "off_size", "offsets_offset", "data_offset")

    def __init__(self, count=0, off_size=0, offsets_offset=0, data_offset=0):
        self.count = count
        self.off_size = off_size
        self.offsets_offset = offsets_offset
        self.data_offset = data_offset

    @classmethod
    def parse(cls, data: bytes, pos: int):
        """Returns (index, new_pos). Offsets are 1-based relative to the
        byte preceding the data region (cff.zig:240-279)."""
        if pos + 2 > len(data):
            raise CffError("truncated INDEX")
        count = int.from_bytes(data[pos : pos + 2], "big")
        pos += 2
        if count == 0:
            return cls(), pos
        if pos >= len(data):
            raise CffError("truncated INDEX")
        off_size = data[pos]
        pos += 1
        if off_size == 0 or off_size > 4:
            raise CffError("bad offSize")
        offsets_offset = pos
        offsets_len = (count + 1) * off_size
        if pos + offsets_len > len(data):
            raise CffError("truncated offsets")
        last_off_pos = offsets_offset + count * off_size
        data_size = int.from_bytes(data[last_off_pos : last_off_pos + off_size], "big") - 1
        pos += offsets_len
        data_offset = pos
        pos += data_size
        return cls(count, off_size, offsets_offset, data_offset), pos

    def get(self, data: bytes, index: int) -> bytes:
        if index >= self.count:
            return b""
        p = self.offsets_offset + index * self.off_size
        start = int.from_bytes(data[p : p + self.off_size], "big")
        end = int.from_bytes(data[p + self.off_size : p + 2 * self.off_size], "big")
        rs = self.data_offset + start - 1
        re_ = self.data_offset + end - 1
        if rs >= len(data) or re_ > len(data) or rs > re_:
            return b""
        return data[rs:re_]


def _parse_dict(data: bytes):
    """Yield (operator, operands) pairs from a CFF DICT (cff.zig:302-375)."""
    pos = 0
    operands: List[int] = []
    n = len(data)
    while pos < n:
        b0 = data[pos]
        if b0 <= 21:
            pos += 1
            op = b0
            if b0 == 12:
                if pos >= n:
                    raise CffError("truncated dict")
                op = (12 << 8) | data[pos]
                pos += 1
            yield op, operands
            operands = []
        elif b0 == 28:
            if pos + 3 > n:
                raise CffError("truncated shortint")
            v = int.from_bytes(data[pos + 1 : pos + 3], "big", signed=True)
            operands.append(v)
            pos += 3
        elif b0 == 29:
            if pos + 5 > n:
                raise CffError("truncated longint")
            operands.append(int.from_bytes(data[pos + 1 : pos + 5], "big", signed=True))
            pos += 5
        elif b0 == 30:  # real: skip nibbles until 0xf terminator
            pos += 1
            while pos < n:
                byte = data[pos]
                pos += 1
                if (byte & 0x0F) == 0x0F or (byte >> 4) == 0x0F:
                    break
            operands.append(0)
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            pos += 1
        elif 247 <= b0 <= 250:
            if pos + 2 > n:
                raise CffError("truncated int")
            operands.append((b0 - 247) * 256 + data[pos + 1] + 108)
            pos += 2
        elif 251 <= b0 <= 254:
            if pos + 2 > n:
                raise CffError("truncated int")
            operands.append(-(b0 - 251) * 256 - data[pos + 1] - 108)
            pos += 2
        else:
            pos += 1  # reserved
    if operands:
        return


class CffParser:
    """GID -> glyph-name lookup from a raw CFF blob."""

    __slots__ = ("data", "string_index", "charsets")

    def __init__(self, data: bytes):
        self.data = data
        self.string_index = _Index()
        self.charsets: List[int] = []
        self._parse()

    def _parse(self) -> None:
        data = self.data
        if len(data) < 4:
            raise CffError("truncated header")
        major = data[0]
        hdr_size = data[2]
        if major != 1:
            raise CffError("only CFF 1.0 supported")
        pos = hdr_size
        _name_index, pos = _Index.parse(data, pos)
        top_dict_index, pos = _Index.parse(data, pos)
        self.string_index, pos = _Index.parse(data, pos)
        _gsubr, pos = _Index.parse(data, pos)

        charset_offset = 0
        charstrings_offset = 0
        if top_dict_index.count > 0:
            for op, operands in _parse_dict(top_dict_index.get(data, 0)):
                if op == 15 and operands:
                    charset_offset = operands[0]
                elif op == 17 and operands:
                    charstrings_offset = operands[0]

        charstrings = _Index()
        if charstrings_offset > 0:
            charstrings, _ = _Index.parse(data, charstrings_offset)

        if charstrings.count > 0:
            self._parse_charset(charset_offset, charstrings.count)

    def _parse_charset(self, offset: int, num_glyphs: int) -> None:
        data = self.data
        if offset == 0:  # ISOAdobe identity 0-228 (cff.zig:127-131)
            n = min(num_glyphs, 229)
            self.charsets = list(range(n))
            return
        if offset in (1, 2):  # Expert / ExpertSubset: unsupported
            return
        if offset >= len(data):
            return
        fmt = data[offset]
        pos = offset + 1
        charsets = [0] * num_glyphs
        gid = 1
        if fmt == 0:
            while gid < num_glyphs and pos + 2 <= len(data):
                charsets[gid] = int.from_bytes(data[pos : pos + 2], "big")
                pos += 2
                gid += 1
        elif fmt == 1:
            while gid < num_glyphs and pos + 3 <= len(data):
                first = int.from_bytes(data[pos : pos + 2], "big")
                n_left = data[pos + 2]
                pos += 3
                for i in range(n_left + 1):
                    if gid + i < num_glyphs:
                        charsets[gid + i] = first + i
                gid += n_left + 1
        elif fmt == 2:
            while gid < num_glyphs and pos + 4 <= len(data):
                first = int.from_bytes(data[pos : pos + 2], "big")
                n_left = int.from_bytes(data[pos + 2 : pos + 4], "big")
                pos += 4
                for i in range(n_left + 1):
                    if gid + i < num_glyphs:
                        charsets[gid + i] = first + i
                gid += n_left + 1
        else:
            raise CffError(f"charset format {fmt} unsupported")
        self.charsets = charsets

    def glyph_name(self, gid: int) -> Optional[str]:
        if gid >= len(self.charsets):
            return None
        sid = self.charsets[gid]
        if sid < len(STD_STRINGS):
            return STD_STRINGS[sid]
        idx = sid - len(STD_STRINGS)
        if idx < self.string_index.count:
            return self.string_index.get(self.data, idx).decode("latin-1")
        return None
