"""Extractor-registry conformance tests (reference parsers.rs; SURVEY.md
§2.1 S3/S4, §2.2 P1-P5 and quirks Q1/Q2)."""

import pytest

from indexer_ray.functions.extractors import (
    extract_csv,
    extract_pdf,
    extract_txt,
    extract_xml,
    get_extractor,
    register_extractor,
    registered_types,
)


class TestCsv:
    def test_header_row_skipped_fields_fused(self):
        # csv::Reader default has_headers=true; fields concatenated with NO
        # separator (parsers.rs:61-63, quirk Q1): "abc","def" -> "abcdef"
        data = "h1,h2\nabc,def\nghi,jkl\n"
        assert extract_csv(data) == "abcdefghijkl"

    def test_field_count_mismatch_record_skipped(self):
        data = "h1,h2\na,b\nonlyone\nc,d\n"
        assert extract_csv(data) == "abcd"

    def test_quoted_fields(self):
        data = 'h1,h2\n"hello, world",x\n'
        assert extract_csv(data) == "hello, worldx"

    def test_empty_and_header_only(self):
        assert extract_csv("") == ""
        assert extract_csv("h1,h2\n") == ""

    def test_undecodable_returns_none(self):
        assert extract_csv(b"\xff\xfe\x00bad") is None


class TestXml:
    def test_text_nodes_only(self):
        data = "<root><a>Hello</a><b attr='x'>World</b></root>"
        assert extract_xml(data) == "Hello World"

    def test_interelement_whitespace_not_indexed(self):
        data = "<root>\n  <a>one</a>\n  <b>two</b>\n</root>"
        assert extract_xml(data) == "one two"

    def test_nested_document_order(self):
        data = "<r>first<inner>second</inner>third</r>"
        assert extract_xml(data) == "first second third"

    def test_parse_error_keeps_prefix(self):
        # reference keeps tokens collected before a per-event error
        # (parsers.rs:163-168); expat stops at the first error
        data = "<r><a>kept</a><broken</r>"
        assert "kept" in (extract_xml(data) or "")

    def test_entity_refs_do_not_split_text_nodes(self):
        # expat splits at entity/char-ref boundaries; xml-rs delivers one
        # coalesced Characters event ('abcd', not 'ab c d')
        assert extract_xml("<r>ab&#99;d</r>") == "abcd"
        assert extract_xml("<r>ab&amp;cd</r>") == "ab&cd"

    def test_cdata_excluded(self):
        # xml-rs emits CData as its own event; the reference's Characters
        # match arm skips it
        assert extract_xml("<r>x<![CDATA[hidden]]>y</r>") == "x y"

    def test_comment_splits_text_nodes(self):
        # a comment ends the text node on both parsers -> two events
        assert extract_xml("<r>a<!--c-->b</r>") == "a b"


class TestRegistry:
    def test_registered_types(self):
        assert {"txt", "md", "csv", "html", "xhtml", "xml", "pdf"} <= set(registered_types())

    def test_unregistered_type_is_none(self):
        # extension filter: unknown types are dropped (lib.rs:239-249, S4)
        assert get_extractor("docx") is None

    def test_register_custom(self):
        register_extractor("rot13", lambda b: "x")
        assert get_extractor("rot13")("anything") == "x"

    def test_txt_passthrough(self):
        assert extract_txt("Hello World") == "Hello World"
        assert extract_txt("Hello".encode()) == "Hello"
        assert extract_txt(b"\xff\xfe") is None

    def test_pdf_not_a_pdf(self):
        assert extract_pdf(b"plain text") is None
        assert extract_pdf(b"") is None

    def test_pdf_no_text(self):
        assert extract_pdf(b"%PDF-1.4\n%%EOF") == ""

    def test_pdf_encrypted_skipped(self):
        assert extract_pdf(b"%PDF-1.4\n1 0 obj <</Encrypt 2 0 R>> endobj") is None

    @staticmethod
    def _mini_pdf(content: bytes, flate: bool = False) -> bytes:
        import zlib

        if flate:
            body = zlib.compress(content)
            filt = b"/Filter /FlateDecode "
        else:
            body, filt = content, b""
        return (
            b"%PDF-1.4\n"
            b"1 0 obj <</Type /Catalog /Pages 2 0 R>> endobj\n"
            b"2 0 obj <</Type /Pages /Kids [3 0 R] /Count 1>> endobj\n"
            b"3 0 obj <</Type /Page /Parent 2 0 R /Contents 4 0 R>> endobj\n"
            b"4 0 obj <<" + filt + b"/Length " + str(len(body)).encode() + b">>\n"
            b"stream\n" + body + b"endstream endobj\n"
            b"%%EOF"
        )

    def test_pdf_plain_stream(self):
        content = b"BT /F1 12 Tf 72 712 Td (Hello) Tj (World) Tj ET"
        out = extract_pdf(self._mini_pdf(content))
        assert out.split() == ["Hello", "World"]

    def test_pdf_flate_stream_and_tj_array(self):
        content = b"BT [(Fla)(te)] TJ (ok \\(escaped\\)) Tj <48695F21> Tj ET"
        out = extract_pdf(self._mini_pdf(content, flate=True))
        # TJ concatenates its array; hex string decodes to Hi_!
        assert out.split() == ["Flate", "ok", "(escaped)", "Hi_!"]

    def test_pdf_non_show_string_operands_dropped(self):
        # strings consumed by a non-show operator must not leak into text
        content = b"BT (shown) Tj (dropped) Td ET"
        assert extract_pdf(self._mini_pdf(content)).split() == ["shown"]

    def test_html_is_markup_serialization(self):
        # quirk Q2: html "text" is the serialized markup, tags included
        html = b"<html><body><p>hi</p></body></html>"
        assert get_extractor("html")(html) == "<html><body><p>hi</p></body></html>"


class TestAdviceFixes:
    def test_pdf_encrypt_bytes_in_content_not_trailer(self):
        # '/Encrypt' inside a shown string must not drop the doc; only the
        # trailer dictionary declares encryption (PDF 32000-1 §7.6.1)
        content = b"BT (uses /Encrypt keyword) Tj ET"
        pdf = (
            TestRegistry._mini_pdf(content)
            + b"\ntrailer <</Root 1 0 R /Size 5>>\nstartxref\n0\n%%EOF"
        )
        assert "/Encrypt" in extract_pdf(pdf)

    def test_pdf_encrypt_in_trailer_skipped(self):
        pdf = (
            TestRegistry._mini_pdf(b"BT (x) Tj ET")
            + b"\ntrailer <</Root 1 0 R /Encrypt 9 0 R>>\nstartxref\n0\n%%EOF"
        )
        assert extract_pdf(pdf) is None

    def test_xhtml_routes_to_xml_parser(self):
        # lib.rs:75 registers xhtml -> parse_xml_document: text nodes only,
        # NOT the html markup-serialization path
        doc = b"<html><body><p>hi</p></body></html>"
        assert get_extractor("xhtml")(doc) == "hi"
