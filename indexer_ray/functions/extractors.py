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
  html/xhtml (parsers.rs:83-115) — conformance mode returns the serialized
           markup itself (tags and attributes become terms; quirk Q2);
           `extract_visible_text` is the engine-mode alternative.
  xml    (parsers.rs:128-173)  — ONLY text-node (Characters) payloads, in
           document order.  Events are joined with a single space: tokens
           cannot span events, so the token stream is identical to the
           reference's per-event tokenize-and-append.  Whitespace-only
           inter-element nodes are Whitespace events in xml-rs and are NOT
           indexed; pure-whitespace Characters content likewise contributes
           no tokens.
  pdf    (parsers.rs:186-219)  — requires a PDF text extractor (lopdf in the
           reference); not available in this environment -> the registry slot
           raises NotImplementedError documenting the integration point.

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


def extract_pdf(data: bytes | str) -> str | None:
    raise NotImplementedError(
        "PDF text extraction needs a PDF library (the reference uses lopdf, "
        "parsers.rs:186-219); none is installed in this environment. "
        "Integrate by registering a replacement: "
        "register_extractor('pdf', my_pdf_to_text)."
    )


_EXTRACTORS: dict[str, Extractor] = {
    "txt": extract_txt,
    "md": extract_txt,
    "csv": extract_csv,
    "html": extract_text,
    "xhtml": extract_text,
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
