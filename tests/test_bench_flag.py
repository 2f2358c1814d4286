"""bench.py window-degradation flag (round-4 verdict "what's wrong"
#1): the per-section protocol-band comparison must flag synthetic
slowdowns and nothing else — pure logic, no SparkSession."""

from bench import PROTOCOL_SEC, WINDOW_FACTOR, degraded_sections


def test_degraded_flag_on_synthetic_slowdown():
    proto = {"extract_text": 2.0, "crawl": 20.0}
    # inside the band: no flag
    assert degraded_sections({"extract_text": 2.0 * WINDOW_FACTOR - 0.01,
                              "crawl": 19.0}, proto) == []
    # one section elevated: flagged alone (the plan-change signature)
    assert degraded_sections({"extract_text": 5.0, "crawl": 19.0},
                             proto) == ["extract_text"]
    # uniform elevation: all flagged (the degraded-window signature)
    got = degraded_sections({"extract_text": 4.0, "crawl": 40.0}, proto)
    assert got == ["crawl", "extract_text"]
    # unknown sections are skipped, never flagged
    assert degraded_sections({"new_section": 99.0}, proto) == []


def test_protocol_bands_cover_all_sections_at_both_levels():
    assert set(PROTOCOL_SEC) == {8, 32}
    expected = {"extract_text", "scrape_relational", "scrape_kernel",
                "minhash_pages", "ann_topk", "crawl"}
    for cpus, bands in PROTOCOL_SEC.items():
        assert set(bands) == expected
        assert all(v > 0 for v in bands.values())
