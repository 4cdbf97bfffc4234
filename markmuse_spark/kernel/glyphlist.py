"""Adobe Glyph List subset: glyph name -> unicode character.

Simple (non-composite) fonts may carry an ``/Encoding`` dictionary whose
``/Differences`` array remaps byte codes to GLYPH NAMES (spec 9.6.6.1;
Appendix D) — the form every pdflatex/dvips-era producer and most
office-suite exporters emit.  Resolving those names needs the public
Adobe Glyph List (AGL); this module carries the subset that covers the
Standard/WinAnsi/MacRoman encodings' name space (ASCII, Latin-1
letters, typographic punctuation, the cp1252 ligature/quote block),
plus the algorithmic ``uniXXXX`` / ``uXXXX[XX]`` forms the AGL
specification defines for everything else.

Reference behavior anchor: the reference OCRs any PDF regardless of
font encoding (``markmuse.py:266-299``); this engine parses the file
itself, so declared simple-font encodings are part of the extraction
dialect (corpus v13).
"""

from __future__ import annotations

# ASCII printable range (codes 32-126), AGL names
_ASCII = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@",
    "bracketleft": "[", "backslash": "\\", "bracketright": "]",
    "asciicircum": "^", "underscore": "_", "grave": "`",
    "braceleft": "{", "bar": "|", "braceright": "}", "asciitilde": "~",
}
_ASCII.update({c: c for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ"})
_ASCII.update({c: c for c in "abcdefghijklmnopqrstuvwxyz"})

# cp1252 0x80-0x9F block (typographic punctuation + ligatures)
_CP1252_HIGH = {
    "Euro": "€", "quotesinglbase": "‚", "florin": "ƒ",
    "quotedblbase": "„", "ellipsis": "…", "dagger": "†",
    "daggerdbl": "‡", "circumflex": "ˆ", "perthousand": "‰",
    "Scaron": "Š", "guilsinglleft": "‹", "OE": "Œ",
    "Zcaron": "Ž", "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "bullet": "•", "endash": "–", "emdash": "—",
    "tilde": "˜", "trademark": "™", "scaron": "š",
    "guilsinglright": "›", "oe": "œ", "zcaron": "ž",
    "Ydieresis": "Ÿ",
}

# Latin-1 0xA0-0xFF (AGL names for ISO-8859-1)
_LATIN1 = {
    "exclamdown": "\xa1", "cent": "\xa2", "sterling": "\xa3",
    "currency": "\xa4", "yen": "\xa5", "brokenbar": "\xa6",
    "section": "\xa7", "dieresis": "\xa8", "copyright": "\xa9",
    "ordfeminine": "\xaa", "guillemotleft": "\xab", "logicalnot": "\xac",
    "registered": "\xae", "macron": "\xaf", "degree": "\xb0",
    "plusminus": "\xb1", "twosuperior": "\xb2", "threesuperior": "\xb3",
    "acute": "\xb4", "mu": "\xb5", "paragraph": "\xb6",
    "periodcentered": "\xb7", "cedilla": "\xb8", "onesuperior": "\xb9",
    "ordmasculine": "\xba", "guillemotright": "\xbb",
    "onequarter": "\xbc", "onehalf": "\xbd", "threequarters": "\xbe",
    "questiondown": "\xbf",
    "Agrave": "\xc0", "Aacute": "\xc1", "Acircumflex": "\xc2",
    "Atilde": "\xc3", "Adieresis": "\xc4", "Aring": "\xc5", "AE": "\xc6",
    "Ccedilla": "\xc7", "Egrave": "\xc8", "Eacute": "\xc9",
    "Ecircumflex": "\xca", "Edieresis": "\xcb", "Igrave": "\xcc",
    "Iacute": "\xcd", "Icircumflex": "\xce", "Idieresis": "\xcf",
    "Eth": "\xd0", "Ntilde": "\xd1", "Ograve": "\xd2", "Oacute": "\xd3",
    "Ocircumflex": "\xd4", "Otilde": "\xd5", "Odieresis": "\xd6",
    "multiply": "\xd7", "Oslash": "\xd8", "Ugrave": "\xd9",
    "Uacute": "\xda", "Ucircumflex": "\xdb", "Udieresis": "\xdc",
    "Yacute": "\xdd", "Thorn": "\xde", "germandbls": "\xdf",
    "agrave": "\xe0", "aacute": "\xe1", "acircumflex": "\xe2",
    "atilde": "\xe3", "adieresis": "\xe4", "aring": "\xe5", "ae": "\xe6",
    "ccedilla": "\xe7", "egrave": "\xe8", "eacute": "\xe9",
    "ecircumflex": "\xea", "edieresis": "\xeb", "igrave": "\xec",
    "iacute": "\xed", "icircumflex": "\xee", "idieresis": "\xef",
    "eth": "\xf0", "ntilde": "\xf1", "ograve": "\xf2", "oacute": "\xf3",
    "ocircumflex": "\xf4", "otilde": "\xf5", "odieresis": "\xf6",
    "divide": "\xf7", "oslash": "\xf8", "ugrave": "\xf9",
    "uacute": "\xfa", "ucircumflex": "\xfb", "udieresis": "\xfc",
    "yacute": "\xfd", "thorn": "\xfe", "ydieresis": "\xff",
}

# StandardEncoding-only names the others don't cover
_STANDARD_EXTRAS = {
    "fi": "ﬁ", "fl": "ﬂ", "fraction": "⁄",
    "dotlessi": "ı", "Lslash": "Ł", "lslash": "ł",
    "breve": "˘", "dotaccent": "˙", "ring": "˚",
    "ogonek": "˛", "hungarumlaut": "˝", "caron": "ˇ",
    "minus": "−", "nbspace": "\xa0",
}

AGL_TO_UNICODE: dict[str, str] = {
    **_ASCII, **_CP1252_HIGH, **_LATIN1, **_STANDARD_EXTRAS,
}


def glyph_to_char(name: str) -> str:
    """One glyph name -> its character, per the AGL specification's
    resolution order: the list itself, then the algorithmic ``uniXXXX``
    (4 hex digits, BMP) and ``uXXXX``/``uXXXXX``/``uXXXXXX`` forms, then
    single-character names verbatim.  Unknown names return '' — a
    Differences entry pointing at an unresolvable glyph contributes no
    text (same suppress-never-misdecode stance as glyph-only CID fonts;
    U+FFFD is reserved for mapped-then-broken, not never-mapped)."""
    ch = AGL_TO_UNICODE.get(name)
    if ch is not None:
        return ch
    if name.startswith("uni") and len(name) == 7:
        try:
            cp = int(name[3:], 16)
            if not 0xD800 <= cp <= 0xDFFF:
                return chr(cp)
        except ValueError:
            pass
    elif name.startswith("u") and 5 <= len(name) <= 7:
        try:
            cp = int(name[1:], 16)
            if cp <= 0x10FFFF and not 0xD800 <= cp <= 0xDFFF:
                return chr(cp)
        except ValueError:
            pass
    if len(name) == 1:
        return name
    return ""
