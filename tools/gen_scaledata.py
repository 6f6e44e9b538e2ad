"""Self-generated scale variants of the driver test tables.

The driver ships sf0.001/0.01/0.1 (TESTDATA.md); every performance claim
above sf0.1 was design-only until round 4. This generator extrapolates
the SAME statistical shape (measured from the driver's sf0.1 parquet) to
larger scale factors so the heavy queries can be benched on a real
scaling curve:

- ``documents``: 50_000 x sf docs, ~54 tokens from the driver corpus's own
  empirical per-language token distribution, lang/source mix matched,
  ~4% planted near-duplicates (copy + small tail edit) and ~0.2% exact
  copies — the dedup queries need realistic collision rates, not iid text.
- ``embeddings``: 20_000 x sf unit vectors, dim 64, 10 Gaussian clusters
  (matches observed label cardinality and component ranges).
- ``events``: 1_000_000 x sf rows over the same fixed 30-day window,
  15_000 x sf users, 5 uniform event types, exponential(50) values,
  written as parquet TIMESTAMP(NANOS) — the exact physical type the
  driver writes, so the nanosAsLong read path is exercised unchanged.

Deterministic: numpy PCG64 seeded 42 + sf. Output is sized by row count
(NOT by matching the driver byte-for-byte — the generators differ); the
curve must therefore compare THIS generator's sf0.1 against its own
sf0.3/sf1, with the driver's sf0.1 as an anchor sanity point.

Usage: python tools/gen_scaledata.py [--sf 0.1 0.3 1] [--out scaledata]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DRIVER_SF01 = "/root/testdata/sf0.1"

DOCS_PER_SF = 50_000
VECS_PER_SF = 20_000
EVENTS_PER_SF = 1_000_000
USERS_PER_SF = 15_000
EMB_DIM = 64
N_LABELS = 10
WINDOW_START_NS = np.datetime64("2024-01-01T00:00:00", "ns").astype(np.int64)
WINDOW_NS = 30 * 24 * 3600 * 10**9  # the driver's fixed 30-day January window


def _empirical_text_model() -> dict:
    """Per-language token distribution + doc-length distribution measured
    from the driver's own sf0.1 documents table."""
    import duckdb

    con = duckdb.connect()
    tok = con.sql(
        f"""
        SELECT lang, u AS token, count(*) AS c
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS u
              FROM '{DRIVER_SF01}/documents.parquet')
        WHERE u != '' GROUP BY 1, 2
        """
    ).fetchall()
    lens = con.sql(
        f"SELECT lang, len(string_split(text, ' ')) FROM "
        f"'{DRIVER_SF01}/documents.parquet'"
    ).fetchall()
    langs = con.sql(
        f"SELECT lang, count(*) FROM '{DRIVER_SF01}/documents.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    model: dict = {"langs": [l for l, _ in langs]}
    total = sum(c for _, c in langs)
    model["lang_p"] = [c / total for _, c in langs]
    model["tokens"] = {}
    for lang in model["langs"]:
        rows = [(t, c) for lg, t, c in tok if lg == lang]
        toks = [t for t, _ in rows]
        cs = np.array([c for _, c in rows], dtype=np.float64)
        model["tokens"][lang] = (toks, cs / cs.sum())
    model["lens"] = {
        lang: np.array([n for lg, n in lens if lg == lang], dtype=np.int64)
        for lang in model["langs"]
    }
    return model


def gen_documents(sf: float, out_dir: str, rng: np.random.Generator) -> int:
    n = int(round(DOCS_PER_SF * sf))
    m = _empirical_text_model()
    lang_idx = rng.choice(len(m["langs"]), size=n, p=m["lang_p"])
    texts: list[str] = []
    langs: list[str] = []
    for i in range(n):
        lang = m["langs"][lang_idx[i]]
        toks, p = m["tokens"][lang]
        length = int(rng.choice(m["lens"][lang]))
        texts.append(" ".join(rng.choice(toks, size=max(length, 1), p=p)))
        langs.append(lang)
    # planted near-duplicates: ~4% of docs are a copy of an earlier doc
    # with a short mutated tail (the regime MinHash/SimHash must catch);
    # ~0.2% are byte-exact copies (the exact-dedup regime)
    n_near = int(n * 0.04)
    n_exact = max(int(n * 0.002), 1)
    for j in rng.choice(np.arange(1, n), size=n_near, replace=False):
        src = int(rng.integers(0, j))
        toks, p = m["tokens"][langs[src]]
        tail = " ".join(rng.choice(toks, size=int(rng.integers(1, 5)), p=p))
        texts[j] = texts[src] + " " + tail
        langs[j] = langs[src]
    for j in rng.choice(np.arange(1, n), size=n_exact, replace=False):
        src = int(rng.integers(0, j))
        texts[j], langs[j] = texts[src], langs[src]
    table = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(
                [f"src{i}" for i in rng.integers(0, 20, size=n)], pa.string()
            ),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64), pa.int64()
            ),
        }
    )
    pq.write_table(table, os.path.join(out_dir, "documents.parquet"))
    return n


def gen_embeddings(sf: float, out_dir: str, rng: np.random.Generator) -> int:
    n = int(round(VECS_PER_SF * sf))
    centers = rng.normal(0, 1, size=(N_LABELS, EMB_DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, N_LABELS, size=n)
    x = centers[labels] * 0.8 + rng.normal(0, 0.35, size=(n, EMB_DIM))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(x.astype(np.float32).ravel(), pa.float32()), EMB_DIM
    ).cast(pa.list_(pa.float32()))
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": emb,
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(out_dir, "embeddings.parquet"))
    return n


def gen_events(sf: float, out_dir: str, rng: np.random.Generator) -> int:
    n = int(round(EVENTS_PER_SF * sf))
    users = max(int(round(USERS_PER_SF * sf)), 1)
    ts = WINDOW_START_NS + rng.integers(0, WINDOW_NS, size=n, dtype=np.int64)
    types = np.array(["click", "view", "purchase", "signup", "error"])
    value = np.minimum(rng.exponential(50.0, size=n), 600.0)
    props = [f'{{"k": {k}}}' for k in rng.integers(0, 100, size=n)]
    table = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            # TIMESTAMP(NANOS) on purpose: the driver's physical type, so
            # the engine's nanosAsLong read path is what gets benched
            "ts": pa.array(ts.view("datetime64[ns]"), pa.timestamp("ns")),
            "user_id": pa.array(rng.integers(0, users, size=n), pa.int64()),
            "event_type": pa.array(types[rng.integers(0, 5, size=n)], pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(props, pa.string()),
        }
    )
    pq.write_table(table, os.path.join(out_dir, "events.parquet"))
    return n


def generator_digest() -> str:
    """SHA-256 of this generator's own source — recorded in every
    MANIFEST.json so a scaling claim can always be traced to the exact
    generator that produced its data (and consumers can refuse drifted
    data; see tools/bench_scaling.py)."""
    import hashlib

    with open(os.path.abspath(__file__), "rb") as fh:
        return hashlib.sha256(fh.read()).hexdigest()


def write_manifest(out_dir: str, sf: float, counts: dict) -> None:
    manifest = {
        "sf": sf,
        "rows": counts,
        "seed": [42, int(sf * 1000)],
        "rng": "numpy PCG64",
        "generator": "tools/gen_scaledata.py",
        "generator_sha256": generator_digest(),
        "per_sf_rows": {
            "documents": DOCS_PER_SF,
            "embeddings": VECS_PER_SF,
            "events": EVENTS_PER_SF,
            "users": USERS_PER_SF,
        },
        "anchor": DRIVER_SF01,
    }
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", nargs="+", type=float, default=[0.1, 0.3, 1.0])
    ap.add_argument(
        "--out", default=os.path.join(os.path.dirname(__file__), "..", "scaledata")
    )
    args = ap.parse_args()
    for sf in args.sf:
        name = f"sf{sf:g}"
        out_dir = os.path.join(args.out, name)
        os.makedirs(out_dir, exist_ok=True)
        rng = np.random.Generator(np.random.PCG64([42, int(sf * 1000)]))
        counts = {
            "documents": gen_documents(sf, out_dir, rng),
            "embeddings": gen_embeddings(sf, out_dir, rng),
            "events": gen_events(sf, out_dir, rng),
        }
        write_manifest(out_dir, sf, counts)
        print(json.dumps({"sf": sf, "dir": out_dir, "rows": counts}))


if __name__ == "__main__":
    main()
