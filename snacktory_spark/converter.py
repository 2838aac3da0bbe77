"""Charset detection & byte-capped decode (SURVEY.md §2.1 S4).

Analog of Converter.streamToString (/root/reference .../Converter.java:96-233):
sniff ``charset=`` / ``encoding=`` in the first 4KB, decode the (max 500KB)
byte stream with the detected charset, default UTF-8. In the Spark pipeline
the `text` column is already UTF-8, so this is used for fixture loading and
offered as a byte-input entry point.
"""

from __future__ import annotations

from .shelper import encoding_cleanup

K2 = 2048
MAX_BYTES = 1_000_000 // 2  # Converter.java:36


def detect_charset(head: str, key: str) -> str | None:
    """Converter.detectCharset (:173-233) over an already-decoded head."""
    enc_index = head.find(key)
    clength = len(key)
    if enc_index > 0 and enc_index + clength < len(head):
        start_char = head[enc_index + clength]
        if start_char == "'":
            last = head.find("'", enc_index + 1 + clength)
        elif start_char == '"':
            last = head.find('"', enc_index + 1 + clength)
        else:
            first = head.find('"', enc_index + clength)
            first = first if first >= 0 else 1 << 62
            sec = head.find(" ", enc_index + clength)
            sec = sec if sec >= 0 else 1 << 62
            last = min(first, sec)
            third = head.find("'", enc_index + clength)
            if third > 0:
                last = min(last, third)
        if enc_index + clength < last < enc_index + clength + 40:
            return encoding_cleanup(head[enc_index + clength:last])
    return None


def bytes_to_string(data: bytes, enc: str | None = None) -> str:
    """Converter.streamToString analog for in-memory bytes.

    Window sizes mirror the reference exactly: the first detectCharset call
    buffers K2 bytes and searches ``charset=`` in THOSE 2048 bytes only; the
    second buffers 2048 more and searches ``encoding=`` in all 4096
    (Converter.java:108-123,180-188). A ``charset=`` past byte 2048 is
    deliberately missed (cnn2.html declares iso-8859-1 at byte 2113 and the
    reference decodes it as UTF-8 — testCnn2's author depends on this).
    """
    encoding = resolve_encoding(data, enc)
    data = data[:MAX_BYTES]
    try:
        return data.decode(encoding, errors="replace")
    except LookupError:
        return data.decode("utf-8", errors="replace")


def resolve_encoding(data: bytes, enc: str | None = None) -> str:
    """The encoding streamToString would decode with (Converter.getEncoding
    analog, ConverterTest.java:31-72): sniffed charset, else `enc`, else
    utf-8; unknown/undecodable names fall back to utf-8 (:137-147)."""
    encoding = (enc or "utf-8").lower()
    head1 = data[:K2].decode("latin-1", errors="replace")
    head2 = data[: 2 * K2].decode("latin-1", errors="replace")
    detected = detect_charset(head1, "charset=") or detect_charset(head2, "encoding=")
    if detected:
        try:
            b"x".decode(detected)
            encoding = detected.lower()
        except (LookupError, UnicodeDecodeError):
            encoding = "utf-8"
    return encoding


def read_file_as_string(path: str) -> str:
    with open(path, "rb") as f:
        return bytes_to_string(f.read())
