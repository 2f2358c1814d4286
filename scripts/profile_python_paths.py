"""cProfile the per-page Python hot paths outside Spark (guide §1:
find where per-task time goes before touching the code).

Profiles, over a sample of synthesized pages:
  * extract_text_streaming through the lenient ladder
  * kernel scrape (scan + 4 Matchers)
  * pages_to_nodes flatten
  * crawl fetch path (gen_html + href extraction)

Usage: python scripts/profile_python_paths.py [n_pages] [which]
"""

from __future__ import annotations

import cProfile
import io
import pathlib
import pstats
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def sample_pages(n: int) -> list[tuple[str, bytes]]:
    """Reproduce pagegen's closed-form html for uid=0..n-1 using
    documents.parquet text via pyarrow (no Spark)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table("/root/testdata/sf0.1/documents.parquet",
                        columns=["doc_id", "text"])
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    copies = 100
    u = len(texts) * copies
    out = []
    for uid in range(n):
        doc_id = uid // copies
        host = 0 if uid % 3 == 0 else uid % 10
        url = f"https://host{host}.example/doc/{uid}"
        text = texts[doc_id]
        links = "".join(
            f'<a href="https://host{(uid + k) % 10}.example/doc/'
            f'{(uid * 31 + k * 7) % u}">L{uid}-{k}</a>'
            for k in range(uid % 5))
        term = (f'<term type="kw{uid % 7}">w{uid % 7}</term>'
                if uid % 3 == 0 else "")
        li = ("<li>•<b>B%d</b></li>" % (uid % 9) if uid % 4 == 0
              else "<li>•</li>" if uid % 4 == 2 else "")
        html = (f'<doc><title id="t{uid}">Doc {uid}</title>'
                f'<p id="p{uid}">{text}</p>{links}{term}{li}</doc>')
        out.append((url, html.encode()))
    return out


def profile(name: str, fn, pages) -> None:
    t0 = time.perf_counter()
    fn(pages)  # warm
    warm = time.perf_counter() - t0
    pr = cProfile.Profile()
    pr.enable()
    fn(pages)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(f"===== {name} (warm pass {warm:.3f}s for {len(pages)} pages, "
          f"{len(pages)/warm:.0f} pages/s) =====")
    print(s.getvalue())


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    pages = sample_pages(n)

    if which in ("all", "extract"):
        from cuphic_spark.kernel.xmlparse import extract_text_streaming
        from cuphic_spark.operators.parse import parse_html_lenient

        def run_extract(pages):
            for _u, html in pages:
                parse_html_lenient(html, parser=extract_text_streaming)

        profile("extract_text_streaming", run_extract, pages)

    if which in ("all", "scrape"):
        from cuphic_spark.kernel import reader
        from cuphic_spark.kernel.match import Matcher
        from cuphic_spark.kernel.scan import scan as kernel_scan
        from cuphic_spark.operators.parse import _html_to_tree

        patterns = {
            "links": "[:a {:href href} ???]",
            "term": "[:term {:type term/type} term/name]",
            "p_id": "[:p {:id ?id} ???]",
            "title": "[:title {:id title/id} title/text]",
        }
        plist = [Matcher(reader.parse(s)) for s in patterns.values()]

        def run_scrape(pages):
            for _u, html in pages:
                tree = _html_to_tree(html)
                if tree is None:
                    continue
                for _nid, _node, results in kernel_scan(tree, *plist):
                    for b in results:
                        if b is not None:
                            pass

        profile("kernel scrape", run_scrape, pages)

    if which in ("all", "nodes"):
        from cuphic_spark.operators.parse import _flatten, _html_to_tree

        def run_nodes(pages):
            for u, html in pages:
                tree = _html_to_tree(html)
                if tree is not None:
                    list(_flatten(u, tree))

        profile("pages_to_nodes flatten", run_nodes, pages)

    if which in ("all", "fetch"):
        from cuphic_spark.frontier import webgraph
        from cuphic_spark.frontier.crawl import _hrefs_streaming
        from cuphic_spark.operators.parse import parse_html_lenient

        urls = [webgraph.url_of(i) for i in range(n)]

        def run_fetch(pages):
            for u in urls:
                data = webgraph.gen_html(u, 1_000_000, 30).encode()
                parse_html_lenient(data, parser=_hrefs_streaming)

        profile("crawl fetch (gen_html + hrefs)", run_fetch, pages)


if __name__ == "__main__":
    main()
