"""langscrape_ray — a Ray-Data-native rebuild of DelmedigoA/langscrape's data plane.

A URL-frontier + fetch-scheduler + HTML-extraction engine expressed as Ray Data
pipelines over Parquet tables of Common-Crawl-style pages
(url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string).

Layout:
  kernel/    pure-Python extraction kernel (no Ray): DOM parse, clean, mini-XPath,
             xpath-map extraction with reference sentinels, html->text, normalize.
  frontier/  pure-Python frontier kernel: URL canonicalization, bloom + cuckoo
             URL-seen filters, robots.txt parsing, politeness scheduling, and a
             single-process oracle crawler used as the correctness reference.
  stages/    Ray Data map_batches stages (Arrow batches; actor pools for state).
  pipelines/ end-to-end pipelines: multi-round crawl, extraction, dedup family,
             similarity search, text analytics, TPC-H-style analytics.
  sources/   readers + deterministic fixture/pages-table generators.
  state/     per-partition checkpoint manifests for resumable runs.

Reference semantics are cited per function as /root/reference/<file>:<lines>.
"""

__version__ = "0.1.0"
