"""Content-type -> text-extractor registry (the analogue of the reference's
extension -> parser-fn map, lib.rs:65-80; SURVEY.md §2.1 S3/S4, §2.2 P1-P5).

Each extractor maps raw document bytes (or str) to the TEXT STRING the shared
tokenizer chain consumes (lowercase -> lex -> stem -> stop-filter happens
downstream, exactly once, in stages/tokenize.py) — the same factoring the
reference uses, where every parser ends with the identical
`to_lowercase -> Lexer::get_tokens` tail.  Returning ``None`` marks the
document undecodable/unparsable; callers silently skip it (lib.rs:260-262).

Registered types and their conformance quirks:

  txt/md (parsers.rs:232-258)  — UTF-8 decode, verbatim.
  csv    (parsers.rs:28-70)    — csv::Reader defaults: the FIRST row is
           consumed as headers and never indexed; records whose field count
           differs from the header are errors and are skipped; every field of
           every surviving record is concatenated with NO separator
           (parsers.rs:61-63 — "abc","def" fuses into the token run
           ``abcdef``; quirk Q1, replicated exactly).
  html   (parsers.rs:83-115)   — conformance mode returns the serialized
           markup itself (tags and attributes become terms; quirk Q2);
           `extract_visible_text` is the engine-mode alternative.
           xhtml routes to the XML parser (lib.rs:75 registers
           xhtml -> parse_xml_document, NOT the html parser).
  xml    (parsers.rs:128-173)  — ONLY text-node (Characters) payloads, in
           document order.  Events are joined with a single space: tokens
           cannot span events, so the token stream is identical to the
           reference's per-event tokenize-and-append.  Whitespace-only
           inter-element nodes are Whitespace events in xml-rs and are NOT
           indexed; pure-whitespace Characters content likewise contributes
           no tokens.
  pdf    (parsers.rs:186-219)  — minimal from-scratch PDF-spec-subset
           extractor (FlateDecode/uncompressed content streams, literal and
           hex strings, Tj/'/\"/TJ show operators; encrypted or non-PDF
           input -> None, the same skip as a reference lopdf load failure).
           No PDF wheel exists offline; replace wholesale for full
           fidelity via register_extractor.

User extension surface: `register_extractor("mytype", fn)` — the Python
analogue of adding a row to get_extensions_map (compile-time in the
reference, runtime here).
"""

from __future__ import annotations

import csv as _csv
import io
import xml.parsers.expat
from collections.abc import Callable

from indexer_ray.conformance.extract import extract_text, extract_visible_text

Extractor = Callable[[bytes | str], "str | None"]


def _decode(data: bytes | str) -> str | None:
    if isinstance(data, str):
        return data
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        return None  # undecodable doc -> silently skipped (lib.rs:260-262)


def extract_txt(data: bytes | str) -> str | None:
    """txt/md: the file content verbatim (parsers.rs:232-258)."""
    return _decode(data)


def extract_csv(data: bytes | str) -> str | None:
    """csv: header row dropped, malformed records skipped, fields of all
    records concatenated with NO separator (parsers.rs:28-70, quirk Q1)."""
    s = _decode(data)
    if s is None:
        return None
    reader = _csv.reader(io.StringIO(s))
    try:
        header = next(reader)
    except StopIteration:
        return ""
    except _csv.Error:
        return ""
    n_fields = len(header)
    parts: list[str] = []
    while True:
        try:
            rec = next(reader)
        except StopIteration:
            break
        except _csv.Error:
            continue  # unreadable record: skipped (parsers.rs:58-60)
        if len(rec) != n_fields:
            continue  # field-count mismatch is an error in the csv crate
        parts.extend(rec)
    return "".join(parts)


def extract_xml(data: bytes | str) -> str | None:
    """xml: text-node payloads only, document order, space-joined
    (token-equivalent to the reference's per-event tokenization,
    parsers.rs:128-173).

    expat reports ONE logical text node as several CharacterData callbacks
    (split at entity/char-ref boundaries: 'ab&#99;d' arrives as
    'ab','c','d'), where xml-rs delivers a single coalesced Characters
    event — so consecutive callbacks are buffered and flushed only at
    structural events (element open/close, comment, PI).  CDATA content is
    excluded: xml-rs emits it as a separate CData event that the
    reference's `XmlEvent::Characters` match arm skips."""
    s = _decode(data)
    if s is None:
        return None
    chunks: list[str] = []
    buf: list[str] = []
    in_cdata = [False]
    p = xml.parsers.expat.ParserCreate()

    def _flush(*_args) -> None:
        if buf:
            text = "".join(buf)
            buf.clear()
            if text.strip():  # whitespace-only node = Whitespace event: skip
                chunks.append(text)

    def _chars(text: str) -> None:
        if not in_cdata[0]:
            buf.append(text)

    def _cdata_start() -> None:
        _flush()
        in_cdata[0] = True

    def _cdata_end() -> None:
        in_cdata[0] = False

    p.CharacterDataHandler = _chars
    p.StartElementHandler = _flush
    p.EndElementHandler = _flush
    p.CommentHandler = _flush
    p.ProcessingInstructionHandler = _flush
    p.StartCdataSectionHandler = _cdata_start
    p.EndCdataSectionHandler = _cdata_end
    try:
        p.Parse(s, True)
    except xml.parsers.expat.ExpatError:
        # the reference logs per-event errors and keeps already-collected
        # tokens (parsers.rs:163-168); expat stops at the first error, so we
        # keep what was parsed up to that point
        pass
    _flush()
    return " ".join(chunks)


def _pdf_literal_string(b: bytes, i: int) -> tuple[bytes, int]:
    """Parse a PDF literal string starting at b[i] == '('; returns
    (content bytes, index past the closing paren).  Handles the escape
    table, octal escapes, nested parens and line continuations
    (PDF 32000-1:2008 §7.3.4.2)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(b)
    esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}
    while i < n and depth:
        c = b[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = b[i]
            if e in esc:
                out.append(esc[e])
            elif e in (0x28, 0x29, 0x5C):
                out.append(e)
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                digits = [e]
                while len(digits) < 3 and i + 1 < n and 0x30 <= b[i + 1] <= 0x37:
                    i += 1
                    digits.append(b[i])
                out.append(int(bytes(digits), 8) & 0xFF)
            elif e in (10, 13):  # escaped EOL: line continuation
                if e == 13 and i + 1 < n and b[i + 1] == 10:
                    i += 1
            else:
                out.append(e)
            i += 1
            continue
        if c == 0x28:
            depth += 1
            out.append(c)
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(c)
        else:
            out.append(c)
        i += 1
    return bytes(out), i


_PDF_STREAM_RE = None  # compiled lazily (binary regex)
_PDF_SHOW_OPS = {b"Tj", b"TJ", b"'", b'"'}


def _pdf_stream_text(stream: bytes) -> list[str]:
    """Shown-text chunks from one decoded content stream: literal/hex
    strings are buffered and emitted when a text-showing operator
    (Tj ' \" TJ, §9.4.3) consumes them; any other alphabetic operator
    discards the buffer (its string operands are not shown text)."""
    chunks: list[str] = []
    pending: list[bytes] = []
    i, n = 0, len(stream)
    while i < n:
        c = stream[i]
        if c == 0x28:  # (
            s, i = _pdf_literal_string(stream, i)
            pending.append(s)
            continue
        if c == 0x3C and stream.startswith(b"<<", i):  # dict: not a string
            i += 2
            continue
        if c == 0x3C:  # hex string
            j = stream.find(b">", i + 1)
            if j == -1:
                break
            hexpart = bytes(ch for ch in stream[i + 1 : j] if not chr(ch).isspace())
            if len(hexpart) % 2:
                hexpart += b"0"
            try:
                pending.append(bytes.fromhex(hexpart.decode("ascii")))
            except ValueError:
                pass
            i = j + 1
            continue
        if (0x41 <= c <= 0x5A) or (0x61 <= c <= 0x7A) or c in (0x27, 0x22):
            j = i
            while j < n and (
                (0x41 <= stream[j] <= 0x5A)
                or (0x61 <= stream[j] <= 0x7A)
                or stream[j] in (0x27, 0x22, 0x2A)
            ):
                j += 1
            op = stream[i:j]
            if op in _PDF_SHOW_OPS:
                if pending:
                    chunks.append(b"".join(pending).decode("latin-1"))
            pending.clear()
            i = j
            continue
        i += 1
    return [c for c in chunks if c.strip()]


def extract_pdf(data: bytes | str) -> str | None:
    """Minimal from-scratch PDF text extraction (PDF 32000-1:2008 subset;
    reference: lopdf per-page extract_text, parsers.rs:186-219, which
    returns no tokens on load failure — we return None, same skip).

    Supported: FlateDecode (zlib) and uncompressed content streams,
    literal + hex strings, Tj / ' / \" / TJ show operators, single-byte
    encodings (latin-1 view).  NOT supported — like simple uses of the
    reference tool — are encrypted documents (None), multi-byte CID
    fonts (garbled there too without ToUnicode CMaps), and exotic stream
    filters (skipped).  Replace wholesale for full fidelity:
    ``register_extractor('pdf', my_pdf_to_text)``."""
    import re as _re
    import zlib

    if isinstance(data, str):
        data = data.encode("latin-1", errors="ignore")
    if not data or not data.lstrip()[:5].startswith(b"%PDF"):
        return None
    # Encryption is declared by an /Encrypt key in the TRAILER dictionary
    # (§7.6.1) — check only trailer-shaped regions, so a content stream or
    # string that happens to contain the bytes '/Encrypt' doesn't drop the
    # document.  Windows checked: after EVERY 'trailer' keyword (updated
    # PDFs carry several trailers; bytes after the real one could also
    # spell 'trailer'), the file tail, and the dict at the last startxref
    # offset (linearized / cross-reference-stream PDFs put the trailer
    # fields in an xref STREAM dict that can sit anywhere in the file).
    windows = []
    pos = data.find(b"trailer")
    while pos != -1:
        windows.append(data[pos : pos + 2048])
        pos = data.find(b"trailer", pos + 1)
    sx = data.rfind(b"startxref")
    if sx != -1:
        digits = data[sx + len(b"startxref") :].split(None, 1)
        if digits and digits[0].isdigit():
            seg = data[int(digits[0]) : int(digits[0]) + 2048]
            if not seg.lstrip().startswith(b"xref"):
                # startxref targets an object, not a classic xref table:
                # xref STREAM pdf — the trailer fields live in this
                # object's dict; scan only the dict (up to 'stream') so
                # stream bytes spelling '/Encrypt' don't false-positive
                end = seg.find(b"stream")
                windows.append(seg if end == -1 else seg[:end])
    if not windows:
        # no trailer keyword and no usable startxref: malformed/truncated
        # file — fall back to the tail, where trailer fields normally live
        windows.append(data[-2048:])
    if any(b"/Encrypt" in w for w in windows):
        return None  # encrypted: lopdf load fails -> doc skipped
    chunks: list[str] = []
    for m in _re.finditer(rb"stream\r?\n(.*?)endstream", data, _re.DOTALL):
        raw = m.group(1)
        try:
            decoded = zlib.decompress(raw)
        except zlib.error:
            decoded = raw
        chunks.extend(_pdf_stream_text(decoded))
    return " ".join(chunks)


_EXTRACTORS: dict[str, Extractor] = {
    "txt": extract_txt,
    "md": extract_txt,
    "csv": extract_csv,
    "html": extract_text,
    "xhtml": extract_xml,  # reference registers xhtml -> parse_xml_document (lib.rs:75)
    "xml": extract_xml,
    "pdf": extract_pdf,
}


def register_extractor(content_type: str, fn: Extractor) -> None:
    """Add/replace an extractor (the user-extension surface; lib.rs:68-80)."""
    _EXTRACTORS[content_type.lower()] = fn


def get_extractor(content_type: str) -> Extractor | None:
    """None for unregistered types — callers drop the doc, replicating the
    extension filter (lib.rs:239-249, S4)."""
    return _EXTRACTORS.get(content_type.lower())


def registered_types() -> list[str]:
    return sorted(_EXTRACTORS)


__all__ = [
    "extract_txt",
    "extract_csv",
    "extract_xml",
    "extract_pdf",
    "extract_text",
    "extract_visible_text",
    "register_extractor",
    "get_extractor",
    "registered_types",
]
