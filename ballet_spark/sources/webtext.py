"""Deterministic synthetic Common-Crawl-style webtext source.

Produces the engine's primary input table per BASELINE.json input_hint:

    url: string, warc_ts: timestamp, html: binary, text: string, lang: string

Properties engineered into the data (FIXTURES.md §6):

- **Zipf-skewed domains** — a head of hot domains exists so skew
  handling (salting / broadcast path) is exercised honestly.
- **Multiple snapshots per url** with irregular inter-arrival gaps, so
  lag/rolling/sessionize/as-of operators have real work to do.
- **Nullable ``lang``** — drives forward-fill (last ignorenulls) goldens.
- **``text`` is byte-identical to ``extract_text(html)``** by
  construction: the per-row invariant required by BASELINE.json is the
  definition of the generator, and pytest re-checks it through the
  vectorized UDF path.

Generation is a pure function of ``(seed, page_id, snapshot_idx)`` —
independent of partitioning — so the distributed generator
(:func:`generate_webtext_spark`, mapInPandas over ``spark.range``)
yields the same rows as the single-node pandas oracle generator for any
cluster size, a prerequisite for resume/lineage tests.
"""

from __future__ import annotations

import hashlib
import re
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

# Fixed vocabulary; index simulates mild language signal via suffixing.
_VOCAB = [
    "data", "web", "page", "crawl", "feature", "engine", "spark", "join",
    "window", "session", "text", "token", "model", "train", "value",
    "time", "stamp", "stream", "batch", "scale", "shard", "index", "query",
    "plan", "merge", "sort", "hash", "group", "count", "mean", "world",
    "open", "source", "archive", "domain", "host", "path", "link", "node",
    "graph", "table", "row", "column", "type", "null", "byte", "char",
    "word", "line", "block",
]

_LANGS = ["en", "de", "fr", "es", None]  # None ⇒ missing lang → ffill target
_LANG_W = np.array([0.55, 0.15, 0.12, 0.08, 0.10])

_TLDS = ["com", "org", "net", "io", "dev"]

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

_P_RE = re.compile(r"<p>(.*?)</p>", re.S)
_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.S)


def extract_text(html: bytes) -> str:
    """HTML → text, the *single* shared extraction routine.

    Used by both the pandas oracle and the Spark vectorized UDF so the
    extracted text is byte-identical across paths (BASELINE.json
    input_hint "per-row invariant"). Joins <p> bodies with a single
    newline; no other normalization.
    """
    s = html.decode("utf-8")
    return "\n".join(_P_RE.findall(s))


def extract_title(html: bytes) -> str:
    s = html.decode("utf-8")
    m = _TITLE_RE.search(s)
    return m.group(1) if m else ""


def _rng_for(seed: int, page_id: int) -> np.random.Generator:
    # Stable per-page stream regardless of partition layout.
    h = hashlib.blake2b(f"{seed}:{page_id}".encode(), digest_size=8).digest()
    return np.random.default_rng(int.from_bytes(h, "big"))


def _page_rows(seed: int, page_id: int, n_domains: int) -> list[dict]:
    rng = _rng_for(seed, page_id)
    # Zipf-ish domain rank: small ranks (hot domains) are most likely.
    rank = min(int(rng.zipf(1.4)), n_domains)
    domain = f"d{rank:05d}.{_TLDS[rank % len(_TLDS)]}"
    url = f"https://{domain}/p/{page_id}"
    # Hot domains' pages get re-crawled more often.
    n_snaps = 1 + int(rng.integers(0, 4)) + (3 if rank <= 3 else 0)
    base_lang_i = int(rng.choice(len(_LANGS), p=_LANG_W))

    rows = []
    t = _EPOCH + timedelta(hours=float(rng.integers(0, 24 * 90)))
    for snap in range(n_snaps):
        # Irregular gaps: mostly minutes-hours, occasionally > 1 day so
        # gap-based sessionization has genuine session breaks.
        if snap:
            if rng.random() < 0.25:
                t += timedelta(hours=float(26 + rng.integers(0, 96)))
            else:
                t += timedelta(minutes=float(5 + rng.integers(0, 600)))
        n_paras = 1 + int(rng.integers(0, 4))
        paras = []
        for _ in range(n_paras):
            n_words = 5 + int(rng.integers(0, 40))
            words = rng.choice(_VOCAB, size=n_words)
            paras.append(" ".join(words))
        title = f"page {page_id} snap {snap}"
        html = (
            f"<html><head><title>{title}</title></head><body>"
            + "".join(f"<p>{p}</p>" for p in paras)
            + "</body></html>"
        ).encode("utf-8")
        # lang intermittently missing (drives forward-fill features)
        lang_i = base_lang_i if rng.random() > 0.3 else len(_LANGS) - 1
        rows.append(
            {
                "url": url,
                "warc_ts": t.replace(tzinfo=None),  # naive UTC, Spark session TZ=UTC
                "html": html,
                "text": extract_text(html),
                "lang": _LANGS[lang_i],
            }
        )
    return rows


def generate_webtext_pdf(
    n_pages: int = 200, seed: int = 42, n_domains: int = 500
) -> pd.DataFrame:
    """Single-node deterministic generator (test oracle side)."""
    rows: list[dict] = []
    for pid in range(n_pages):
        rows.extend(_page_rows(seed, pid, n_domains))
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"])
    return pdf


WEBTEXT_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def generate_webtext_spark(spark, n_pages: int = 200, seed: int = 42, n_domains: int = 500):
    """Distributed generator: same rows as :func:`generate_webtext_pdf`.

    ``spark.range`` shards page ids across executors; each partition
    materializes its pages with the identical pure per-page function, so
    output is partition-layout-independent (union of rows is identical;
    order is not guaranteed, as everywhere in Spark).
    """

    def gen(iterator):
        for pdf in iterator:
            out: list[dict] = []
            for pid in pdf["id"].tolist():
                out.extend(_page_rows(seed, int(pid), n_domains))
            yield pd.DataFrame(out, columns=["url", "warc_ts", "html", "text", "lang"])

    # over-partition (4× cores): downstream scans of the written table
    # inherit file-level parallelism, so a later 4N-core run is not
    # capped by the file count an N-core run produced
    npart = max(1, min(4 * spark.sparkContext.defaultParallelism, n_pages))
    return spark.range(0, n_pages, numPartitions=npart).mapInPandas(gen, WEBTEXT_DDL)
