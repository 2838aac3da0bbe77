"""Minimal PDF layout parsing (north rule: "HTML boilerplate strip,
PDF/layout parse, DOM heuristics").

Two pure-python (stdlib-only: zlib) halves:

- ``make_simple_pdf(text)``: deterministic single-page PDF-1.4 with a
  FlateDecode'd content stream. Used to synthesize PDF payloads at test /
  bench time (the sandbox ships no PDF corpus) — and it's a real PDF:
  xref table, catalog/pages/page objects, Helvetica text operators.
- ``extract_pdf_text(data)``: a real extractor for the text-operator subset
  of PDF: scans ``N 0 obj … endobj`` objects, inflates /FlateDecode
  streams, and walks BT…ET text blocks evaluating ``(…) Tj``, ``[…] TJ``,
  ``'``/``"`` show-with-newline, and ``Td/TD/T*`` line moves (a negative
  y-move emits a newline). String escapes (\\\\ \\( \\) \\n \\r \\t \\b
  \\f, octal \\ddd, line continuations) are decoded per the spec.

This is deliberately the layout-text subset (no fonts/ToUnicode/encodings
beyond latin-1, no encryption): enough to round-trip machine-generated
report/invoice-class PDFs byte-exactly, which is what a training-data
pipeline sees at scale. Anything unparseable degrades to ok=false, never an
exception (same failure contract as HTML extraction).

Spark-side: ``snacktory_spark.multimodal.pdf_extract_df`` maps a binary
column through this via Arrow-batched mapInPandas.
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

_ESCAPE = {"\\": r"\\", "(": r"\(", ")": r"\)",
           "\n": r"\n", "\r": r"\r", "\t": r"\t", "\b": r"\b", "\f": r"\f"}


def _pdf_escape(s: str) -> str:
    return "".join(_ESCAPE.get(c, c) for c in s)


def make_simple_pdf(text: str, split_tj: bool = False) -> bytes:
    """A complete single-page PDF whose content stream shows `text`.

    split_tj=True emits the text as a two-part ``[(a) -120 (b)] TJ`` array
    (exercises the TJ path); otherwise a single ``(…) Tj``.
    """
    if split_tj and len(text) >= 2:
        mid = len(text) // 2
        shown = (f"[({_pdf_escape(text[:mid])}) -120 "
                 f"({_pdf_escape(text[mid:])})] TJ")
    else:
        shown = f"({_pdf_escape(text)}) Tj"
    # string bytes are UTF-8 (common for machine-generated PDFs; the
    # extractor decodes UTF-8 with latin-1 fallback) — escapes only touch
    # ASCII characters, so escaping-then-encoding is safe
    content = f"BT /F1 11 Tf 72 720 Td {shown} ET".encode("utf-8")
    flate = zlib.compress(content)

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
         b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
        (b"<< /Length " + str(len(flate)).encode() +
         b" /Filter /FlateDecode >>\nstream\n" + flate + b"\nendstream"),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


# ---------------------------------------------------------------------------
# extractor
# ---------------------------------------------------------------------------

# the keyword only (lookbehind: 'endstream\n' must not match as a start)
_STREAM_START_RE = re.compile(rb"(?<![a-zA-Z])stream\r?\n")
# (?!\d) pins the match to the FULL digit run — a bare (\d+) would let the
# indirect-ref form '/Length 100 0 R' backtrack to match '10' as a direct
# length (review finding). Written without a possessive quantifier (\d++,
# py>=3.11 only) so the module imports on any executor Python (ADVICE r2).
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")

# inflate cap: a crafted stream must not be able to OOM an executor
# (decompression bomb); anything bigger than this is skipped as junk
MAX_INFLATED = 1 << 26  # 64 MB per stream


def _iter_streams(data: bytes):
    """Yield (dict_head, raw_stream_bytes) by sequential absolute-offset
    scanning, honoring a direct-integer /Length.

    Slicing by /Length from absolute offsets (not from a regex-delimited
    object body) makes embedded keyword bytes inside compressed data —
    'endobj', 'endstream', even 'stream' — harmless: the scan position
    jumps past each consumed stream (review finding: the old
    '(.*?)endobj' object regex truncated streams whose flate bytes
    contained 'endobj'). The EOL before `endstream` is a delimiter, NOT
    data — data may itself end in \\r (hypothesis found exactly this), so
    the /Length-less fallback strips at most one EOL.
    """
    pos = 0
    n = len(data)
    while pos < n:
        sm = _STREAM_START_RE.search(data, pos)
        if sm is None:
            return
        # the stream's dict sits between the owning 'N G obj' and 'stream';
        # scan back to the nearest ' obj' with NO fixed cap — a 2048-byte
        # window truncated long dicts, losing /Filter and /Length and
        # letting flate bytes be read as raw text operators (ADVICE r2).
        # The backscan is bounded below by pos (already-consumed bytes), so
        # windows are disjoint across iterations: total work stays O(n).
        obj_at = data.rfind(b" obj", pos, sm.start())
        head = data[obj_at if obj_at >= 0 else pos:sm.start()]
        start = sm.end()
        lm = _LENGTH_RE.search(head)
        if lm:
            end = start + int(lm.group(1))
            raw = data[start:end]
        else:
            em = data.find(b"endstream", start)
            if em < 0:
                return
            raw = data[start:em]
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith((b"\n", b"\r")):
                raw = raw[:-1]
            end = em
        yield head, raw
        pos = max(end, start)
_PAGE_RE = re.compile(rb"/Type\s*/Page(?![sS])")

_DELIMS = b" \t\r\n\x00()[]<>/%"


def _iter_text_blocks(raw: bytes):
    """Yield the operator bytes of each BT…ET text block.

    A regex `BT(.*?)ET` is wrong: 'ET' (or 'BT') appearing INSIDE a (…)
    string literal terminates the block early (hypothesis found text '0ET'
    extracting as ''). This scanner skips string literals (escape-aware)
    and only accepts BT/ET at delimiter boundaries."""
    n = len(raw)
    pos = 0
    while True:
        i = raw.find(b"BT", pos)
        if i < 0:
            return
        if ((i > 0 and raw[i - 1] not in _DELIMS)
                or (i + 2 < n and raw[i + 2] not in _DELIMS)):
            pos = i + 2
            continue
        j = i + 2
        end = -1
        while j < n:
            c = raw[j]
            if c == 0x28:  # ( string literal — skip, honoring escapes
                depth = 1
                j += 1
                while j < n and depth:
                    b = raw[j]
                    if b == 0x5C:
                        j += 2
                        continue
                    if b == 0x28:
                        depth += 1
                    elif b == 0x29:
                        depth -= 1
                    j += 1
                continue
            if (c == 0x45 and raw[j + 1:j + 2] == b"T"
                    and raw[j - 1] in _DELIMS
                    and (j + 2 >= n or raw[j + 2] in _DELIMS)):
                end = j
                break
            j += 1
        if end < 0:
            return
        yield raw[i + 2:end]
        pos = end + 2


def _unescape_string(body: bytes) -> str:
    out = bytearray()
    i = 0
    n = len(body)
    while i < n:
        c = body[i]
        if c == 0x5C and i + 1 < n:  # backslash
            d = body[i + 1]
            mapped = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09,
                      0x62: 0x08, 0x66: 0x0C,
                      0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}.get(d)
            if mapped is not None:
                out.append(mapped)
                i += 2
                continue
            if 0x30 <= d <= 0x37:  # octal \d, \dd, \ddd
                j = i + 1
                oct_digits = []
                while j < n and len(oct_digits) < 3 and 0x30 <= body[j] <= 0x37:
                    oct_digits.append(chr(body[j]))
                    j += 1
                out.append(int("".join(oct_digits), 8) & 0xFF)
                i = j
                continue
            if d in (0x0A, 0x0D):  # line continuation
                i += 2
                if d == 0x0D and i < n and body[i] == 0x0A:
                    i += 1
                continue
            out.append(d)  # unknown escape: PDF spec says drop the \
            i += 2
            continue
        out.append(c)
        i += 1
    try:
        return out.decode("utf-8")
    except UnicodeDecodeError:
        return out.decode("latin-1")


def _scan_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse a (…)-string starting at data[i] == '('; returns (text, next)."""
    depth = 1
    i += 1
    start = i
    buf = bytearray()
    while i < len(data) and depth > 0:
        c = data[i]
        if c == 0x5C:  # escape: copy both bytes verbatim, decode later
            buf += data[i:i + 2]
            i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                i += 1
                break
        buf.append(c)
        i += 1
    del start
    return _unescape_string(bytes(buf)), i


def _emit_text_block(block: bytes, out: list[str]) -> None:
    """Evaluate one BT…ET block's show/positioning operators."""
    i = 0
    n = len(block)
    pending_op: list[str] = []  # operand stack (strings + numbers as str)
    while i < n:
        c = block[i]
        if c == 0x28:  # (string)
            s, i = _scan_string(block, i)
            pending_op.append("S:" + s)
            continue
        if c == 0x5B:  # [ TJ array — strings concatenate, numbers are kerning
            i += 1
            parts = []
            while i < n and block[i] != 0x5D:
                if block[i] == 0x28:
                    s, i = _scan_string(block, i)
                    parts.append(s)
                else:
                    i += 1
            pending_op.append("S:" + "".join(parts))
            i += 1
            continue
        if block.startswith(b"Tj", i) or block.startswith(b"TJ", i):
            for p in pending_op:
                if p.startswith("S:"):
                    out.append(p[2:])
            pending_op = []
            i += 2
            continue
        if block.startswith(b"T*", i):
            out.append("\n")
            pending_op = []
            i += 2
            continue
        if block.startswith(b"TD", i) or block.startswith(b"Td", i):
            # a downward line move = new line; capture last two numbers
            nums = [p for p in pending_op if not p.startswith("S:")]
            try:
                if nums and float(nums[-1]) < 0:
                    out.append("\n")
            except ValueError:
                pass
            pending_op = []
            i += 2
            continue
        if c in (0x27, 0x22):  # ' and " = next-line + show
            out.append("\n")
            for p in pending_op:
                if p.startswith("S:"):
                    out.append(p[2:])
            pending_op = []
            i += 1
            continue
        m = re.match(rb"[-+]?\d*\.?\d+", block[i:i + 24])
        if m and (c in b"-+.0123456789"):
            pending_op.append(m.group(0).decode())
            i += m.end()
            continue
        if c not in b" \t\r\n":
            # any other operator consumes its operands (Tf, Tc, Tw, Tm ...)
            j = i
            while j < n and block[j] not in b" \t\r\n([":
                j += 1
            pending_op = []
            i = max(j, i + 1)
            continue
        i += 1
    # trailing shown strings without an explicit Tj (malformed) are dropped


def extract_pdf_text(data: bytes) -> dict:
    """Extract layout text from PDF bytes.

    Returns {"text": str, "n_pages": int, "ok": bool, "error": str|None}.
    Never raises.
    """
    try:
        if not data or not data.startswith(b"%PDF-"):
            return {"text": "", "n_pages": 0, "ok": False,
                    "error": "not a PDF (missing %PDF- header)"}
        n_pages = len(_PAGE_RE.findall(data))
        chunks: list[str] = []
        for head, raw in _iter_streams(data):
            if b"/FlateDecode" in head:
                try:
                    d = zlib.decompressobj()
                    raw = d.decompress(raw, MAX_INFLATED)
                    if d.unconsumed_tail:
                        continue  # decompression bomb — skip stream
                except zlib.error:
                    continue
            elif b"/Filter" in head:
                continue  # unsupported filter (DCT, LZW, ...) — skip stream
            for block in _iter_text_blocks(raw):
                _emit_text_block(block, chunks)
        text = "".join(chunks)
        return {"text": text, "n_pages": n_pages, "ok": True, "error": None}
    except Exception as e:  # noqa: BLE001 — robustness over a 10^12-row table
        return {"text": "", "n_pages": 0, "ok": False,
                "error": f"{type(e).__name__}: {e}"[:200]}
