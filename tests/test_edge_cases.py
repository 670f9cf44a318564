"""Edge cases: unicode byte-identity, empty inputs, all-error batches,
nested/hostile HTML."""

from __future__ import annotations

import pyarrow as pa

from documentai_ray.stages.extract import extract_batch, extract_one, html_main_content
from documentai_ray.stages.quality import quality_batch


class TestUnicodeByteIdentity:
    def test_cjk_content(self):
        body = "这是一个足够长的中文段落，用来测试抽取器的字节一致性保证。"
        html = f"<html><body><p>{body}</p></body></html>".encode("utf-8")
        t, kind, err, _ = extract_one(html)
        assert t == body and kind == "html"

    def test_emoji_and_accents(self):
        body = "Résumé naïve café — emoji 🎉🎊 inside a long enough paragraph."
        html = f"<html><body><p>{body}</p></body></html>".encode("utf-8")
        t, _, _, _ = extract_one(html)
        assert t == body

    def test_html_entities_decoded(self):
        html = b"<html><body><p>Fish &amp; chips cost &lt;5 pounds here, honestly.</p></body></html>"
        t, _, _, _ = extract_one(html)
        assert t == "Fish & chips cost <5 pounds here, honestly."

    def test_nbsp_is_whitespace(self):
        html = "<html><body><p>words separated by nbsp characters here ok</p></body></html>".encode()
        t, _, _, _ = extract_one(html)
        assert " " not in t and "words separated by nbsp" in t


class TestHostileHtml:
    def test_comments_and_cdata_ignored(self):
        html = ("<html><body><!-- a very long comment that should never appear -->"
                "<p>Actual paragraph content that is long enough.</p></body></html>")
        assert html_main_content(html) == "Actual paragraph content that is long enough."

    def test_unclosed_tags(self):
        html = "<html><body><div><p>Paragraph that never closes and is long enough"
        assert html_main_content(html) == "Paragraph that never closes and is long enough"

    def test_deeply_nested(self):
        inner = "Deep content paragraph long enough to keep."
        html = "<div>" * 50 + f"<p>{inner}</p>" + "</div>" * 50
        assert html_main_content(html) == inner

    def test_mixed_case_tags(self):
        html = "<HTML><BODY><P>Upper case tags still parse fine here ok.</P></BODY></HTML>"
        assert html_main_content(html) == "Upper case tags still parse fine here ok."


class TestBatchEdgeCases:
    def test_empty_batch(self):
        t = pa.table({
            "url": pa.array([], pa.string()),
            "html": pa.array([], pa.large_binary()),
            "text": pa.array([], pa.large_string()),
        })
        out = extract_batch(t)
        assert out.num_rows == 0
        assert "text" in out.column_names and "error" in out.column_names

    def test_all_malformed_batch(self):
        t = pa.table({
            "url": ["u1", "u2"],
            "html": pa.array([b"\xff\xfe", b"\x80\x81"], pa.large_binary()),
            "text": pa.array(["", ""], pa.large_string()),
        })
        out = extract_batch(t)
        assert out.column("payload_kind").to_pylist() == ["error", "error"]
        # quality still processes error rows (blank → re_scan)
        q = quality_batch(out)
        assert q.column("verdict").to_pylist() == ["re_scan", "re_scan"]

    def test_empty_dataset_through_flagship_stages(self, ray_session):
        from documentai_ray.stages.classify import ClassifyStage

        t = pa.table({"text": pa.array([], pa.large_string())})
        out = ClassifyStage()(t)
        assert out.num_rows == 0
        assert "category" in out.column_names


class TestWidePayloads:
    def test_multi_megabyte_payload_processes_and_is_projected_away(self):
        # memory-aware contract: a wide binary row parses, and the payload
        # never travels past the extract stage
        body = "word " * 400_000  # ~2 MB of text inside one paragraph
        html = f"<html><body><p>{body.strip()}</p></body></html>".encode()
        t = pa.table({
            "url": ["big"],
            "html": pa.array([html], pa.large_binary()),
            "text": pa.array([""], pa.large_string()),
        })
        out = extract_batch(t)
        assert "html" not in out.column_names
        assert out.column("n_chars") if "n_chars" in out.column_names else True
        assert len(out.column("text").to_pylist()[0]) > 1_000_000
