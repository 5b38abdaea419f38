"""From-scratch HTML -> text extraction for real-world (adversarial) markup.

The synthetic-corpus fast path stays JVM-side (sources/pages.extract_text:
one ``regexp_extract`` — zero Python).  THIS module is the general path a
crawl pipeline needs when the markup is hostile: unclosed tags, script/
style bodies, comments hiding tags, ``>`` inside quoted attributes,
entities, malformed UTF-8.  It is a single left-to-right scanner — no
external parser library — wrapped in an Arrow-batched pandas UDF by
``sources/pages.extract_text_html`` (SURVEY §2.7 UDF 1).

EXACT SEMANTICS (the contract an independent implementation can — and in
tests/test_html_extract.py does — reproduce byte-for-byte):

1.  Bytes decode as UTF-8 with ``errors="replace"``.
2.  One scan, left to right.  At each ``<`` the FIRST matching rule wins:
    a. ``<!--``  — comment: skip to the first ``-->`` (inclusive); if
       none, to end of input.  Emits one space.
    b. ``<name`` where name ∈ {script, style, noscript, template, head}
       (ASCII case-insensitive) followed by one of ``[ \\t\\n\\r\\f\\v/>]``
       or end-of-input — raw container: skip its open tag under rule (c)'s
       quote logic, then skip to the first ASCII-case-insensitive
       ``</name``, then to the first ``>`` at-or-after it (inclusive); any
       piece missing → to end of input.  Emits one space.  (Content is
       dropped: scripts/styles/head are never text; no comment or nesting
       awareness inside, like HTML5 raw-text elements.)
    c. ``<`` followed by an ASCII letter, ``/``, ``!`` or ``?`` — tag:
       skip to the first ``>`` that is not inside a ``"…"`` or ``'…'``
       quoted section (a quote opens at the quote char and closes at its
       twin; an unclosed quote or missing ``>`` runs to end of input).
       Emits one space.
    d. anything else — the ``<`` is literal text.
3.  Character entities decode in the surviving text: ``&`` + body + ``;``
    where the ``;`` is the first semicolon within 32 chars of the ``&``.
    A body ``#digits`` / ``#x``/``#X``+hex decodes via ``chr`` when the
    code point is in [1, 0x10FFFF] and not a surrogate; a body matching
    ``[A-Za-z][A-Za-z0-9]*`` decodes via the ENTITIES table.  Anything
    else (unknown name, bad code point, malformed body) stays verbatim
    and scanning resumes right after the ``&``.
4.  Whitespace (Unicode, incl. the spaces emitted for tags) collapses to
    single spaces; leading/trailing stripped — ``" ".join(s.split())``.

No reference counterpart (the reference repo consumes pre-extracted
TACRED text); mandated web-pipeline extension (VERDICT r4 task #2).
"""

from __future__ import annotations

import string

# ASCII-only lowering: str.lower() is NOT length-preserving for some
# Unicode chars (U+0130 lowers to 2 codepoints), which would misalign
# the lowered shadow string used for case-insensitive finds.
_ASCII_LOWER = str.maketrans(string.ascii_uppercase, string.ascii_lowercase)

RAW_CONTAINERS = ("script", "style", "noscript", "template", "head")
_NAME_END = " \t\n\r\f\v/>"
_MAX_ENTITY = 32

# Spec data shared with the test oracle (the table IS the spec, like the
# gazetteer); machinery is independent on each side.
ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "copy": "©", "reg": "®",
    "ndash": "–", "mdash": "—", "hellip": "…",
    "lsquo": "‘", "rsquo": "’",
    "ldquo": "“", "rdquo": "”",
    "deg": "°", "middot": "·", "laquo": "«",
    "raquo": "»", "eacute": "é", "shy": "­",
}


def _skip_tag(s: str, lt: int) -> int:
    """Index just past the tag opened at ``s[lt] == '<'`` (rule 2c)."""
    n = len(s)
    i = lt + 1
    while i < n:
        ch = s[i]
        if ch == ">":
            return i + 1
        if ch == '"' or ch == "'":
            j = s.find(ch, i + 1)
            if j == -1:
                return n
            i = j + 1
        else:
            i += 1
    return n


def _raw_container_at(s: str, low: str, lt: int) -> str | None:
    for name in RAW_CONTAINERS:
        end = lt + 1 + len(name)
        if low.startswith(name, lt + 1) and (
            end >= len(s) or s[end] in _NAME_END
        ):
            return name
    return None


def _skip_raw(s: str, low: str, lt: int, name: str) -> int:
    n = len(s)
    i = _skip_tag(s, lt)
    if i >= n:
        return n
    k = low.find("</" + name, i)
    if k == -1:
        return n
    g = s.find(">", k)
    return n if g == -1 else g + 1


def _entity_value(body: str) -> str | None:
    if body.startswith("#"):
        num = body[1:]
        # explicit ASCII charsets: int() would also accept unicode
        # digits and '_' separators, which are NOT valid entity bodies
        if num[:1] in ("x", "X"):
            digits = num[1:]
            if not digits or any(c not in string.hexdigits for c in digits):
                return None
            cp = int(digits, 16)
        else:
            if not num or any(c not in string.digits for c in num):
                return None
            cp = int(num)
        if 1 <= cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
            return chr(cp)
        return None
    if not body or not body.isascii():
        return None
    if not (body[0].isalpha() and body.isalnum()):
        return None
    return ENTITIES.get(body)


def decode_entities(s: str) -> str:
    out = []
    i = 0
    while True:
        amp = s.find("&", i)
        if amp == -1:
            out.append(s[i:])
            break
        out.append(s[i:amp])
        semi = s.find(";", amp + 1, amp + 1 + _MAX_ENTITY)
        rep = _entity_value(s[amp + 1:semi]) if semi != -1 else None
        if rep is None:
            out.append("&")
            i = amp + 1
        else:
            out.append(rep)
            i = semi + 1
    return "".join(out)


def html_to_text(s: str) -> str:
    """Rules 2-4 over an already-decoded string."""
    low = s.translate(_ASCII_LOWER)
    n = len(s)
    out = []
    i = 0
    while i < n:
        lt = s.find("<", i)
        if lt == -1:
            out.append(s[i:])
            break
        out.append(s[i:lt])
        if s.startswith("<!--", lt):
            end = s.find("-->", lt + 4)
            i = n if end == -1 else end + 3
            out.append(" ")
            continue
        raw = _raw_container_at(s, low, lt)
        if raw is not None:
            i = _skip_raw(s, low, lt, raw)
            out.append(" ")
            continue
        nxt = s[lt + 1] if lt + 1 < n else ""
        if nxt and nxt.isascii() and (nxt.isalpha() or nxt in "/!?"):
            i = _skip_tag(s, lt)
            out.append(" ")
        else:
            out.append("<")
            i = lt + 1
    return " ".join(decode_entities("".join(out)).split())


def html_bytes_to_text(data) -> str:
    """Rule 1 + :func:`html_to_text`: the per-row function the pandas UDF
    maps over an Arrow batch."""
    if data is None:
        return ""
    if isinstance(data, (bytes, bytearray, memoryview)):
        s = bytes(data).decode("utf-8", "replace")
    else:
        s = str(data)
    return html_to_text(s)
