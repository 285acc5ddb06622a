"""Scale up the driver's testdata to a larger scale factor.

The driver generates sf{0.001,0.01,0.1} (TESTDATA.md, read-only); the r7
verdict's top ask is to prove the oracle + ratio bar at sf1, where per-row
work dominates Spark's per-job scheduling floor instead of the other way
around. This writes a new sf directory with 10× (or --repl N×) the rows:

- region/nation: copied verbatim (fixed dims — TPC-H dims don't scale).
- customer/supplier/part/orders/lineitem/events: each replica r remaps
  every key column by +r*count(base table), so FK relationships, group
  sizes, and selectivities are preserved exactly — per-key distributions
  at sf1 are identical to sf0.1, only cardinalities grow 10×.
  Customer#/Supplier# names are regenerated from the new key (uniqueness).
- documents/embeddings: replica 0 is the original (keeps the driver's
  planted near-dup structure and seed vectors); replicas 1..N-1 are FRESH
  draws from the measured distributions (token soup over the observed
  31-token vocab with empirical frequencies, empirical lang mix,
  source=doc_id%20; unit-norm N(0,1) float32 vectors, uniform labels).
  Verbatim replication would have made every doc a 10-way exact dup and
  every vector a 10-way near-dup — a 90%-duplicate corpus measures the
  dedup operators' worst case, not scale-up.

Schemas (incl. the µs NTZ timestamp physical type the loader probes for)
are taken from the base files, so sf1 reads exercise the same code paths.

Usage: python tools/gen_sf.py [--base /root/testdata/sf0.1]
                              [--out /root/repo/testdata/sf1] [--repl 10]
"""

from __future__ import annotations

import argparse
import collections
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# key spaces at the base scale: table -> (key column -> count multiplier
# source table). Counts are read from the base files, not hardcoded.
KEYMAP = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "_users"},
}

NAME_COLS = {
    "customer": ("c_name", "Customer#{:09d}", "c_custkey"),
    "supplier": ("s_name", "Supplier#{:09d}", "s_suppkey"),
}


def replicate_table(name: str, base_dir: str, out_dir: str, repl: int,
                    counts: dict[str, int]) -> None:
    t = pq.read_table(os.path.join(base_dir, f"{name}.parquet"))
    schema = t.schema
    cols = {c: t[c].to_numpy(zero_copy_only=False) for c in t.column_names}
    # +r*count remapping is collision-free ONLY for dense 0/1-based keys;
    # sparse keys (standard TPC-H o_orderkey skips values) would silently
    # collide across replicas and corrupt FK fan-out — fail loudly instead
    for c, src in KEYMAP[name].items():
        assert int(cols[c].max()) < counts[src] + 1, (
            f"{name}.{c}: max key {int(cols[c].max())} exceeds the "
            f"{src} stride {counts[src]} — sparse key space, replicas "
            "would collide; use a max(key)+1 stride for this column"
        )
    out_cols = {c: [] for c in t.column_names}
    for r in range(repl):
        for c in t.column_names:
            if c in KEYMAP[name]:
                out_cols[c].append(cols[c] + r * counts[KEYMAP[name][c]])
            else:
                out_cols[c].append(cols[c])
    arrays = []
    for c in t.column_names:
        v = np.concatenate(out_cols[c])
        if name in NAME_COLS and c == NAME_COLS[name][0]:
            _, fmt, keycol = NAME_COLS[name]
            keys = np.concatenate(out_cols[keycol])
            v = np.array([fmt.format(int(k)) for k in keys], dtype=object)
        arrays.append(pa.array(v, type=schema.field(c).type))
    pq.write_table(pa.table(arrays, schema=schema),
                   os.path.join(out_dir, f"{name}.parquet"))


def gen_documents(base_dir: str, out_dir: str, repl: int) -> None:
    t = pq.read_table(os.path.join(base_dir, "documents.parquet"))
    base_n = t.num_rows
    texts = t["text"].to_pylist()
    langs = t["lang"].to_pylist()
    # empirical token + lang frequencies
    tok_counts = collections.Counter()
    for s in texts:
        tok_counts.update(s.split(" "))
    vocab = sorted(tok_counts)
    tok_p = np.array([tok_counts[w] for w in vocab], dtype=float)
    tok_p /= tok_p.sum()
    lang_counts = collections.Counter(langs)
    lang_vals = sorted(lang_counts)
    lang_p = np.array([lang_counts[v] for v in lang_vals], dtype=float)
    lang_p /= lang_p.sum()
    n_toks = np.array([len(s.split(" ")) for s in texts])

    doc_id = list(range(base_n))
    text = list(texts)
    lang = list(langs)
    for r in range(1, repl):
        rng = np.random.default_rng(4200 + r)
        # sample lengths from the EMPIRICAL per-doc token counts so the
        # replicas keep the base corpus's length profile (a uniform
        # [min,max] draw had a different distribution than advertised)
        lens = rng.choice(n_toks, size=base_n)
        for i in range(base_n):
            did = r * base_n + i
            doc_id.append(did)
            text.append(" ".join(
                rng.choice(vocab, size=lens[i], p=tok_p)
            ))
            lang.append(lang_vals[rng.choice(len(lang_vals), p=lang_p)])
    source = [f"src{d % 20}" for d in doc_id]
    n_chars = [len(s) for s in text]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_id, pa.int64()),
                "text": pa.array(text, pa.string()),
                "lang": pa.array(lang, pa.string()),
                "source": pa.array(source, pa.string()),
                "n_chars": pa.array(n_chars, pa.int64()),
            },
            schema=t.schema,
        ),
        os.path.join(out_dir, "documents.parquet"),
    )


def gen_embeddings(base_dir: str, out_dir: str, repl: int) -> None:
    t = pq.read_table(os.path.join(base_dir, "embeddings.parquet"))
    base_n = t.num_rows
    dim = len(t["embedding"][0])
    vec_id = np.arange(base_n * repl, dtype=np.int64)
    vecs = [np.array(t["embedding"].to_pylist(), dtype=np.float32)]
    labels = [np.array(t["label"].to_pylist(), dtype=np.int32)]
    for r in range(1, repl):
        rng = np.random.default_rng(8400 + r)
        v = rng.standard_normal((base_n, dim)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        vecs.append(v)
        labels.append(rng.integers(0, 10, size=base_n).astype(np.int32))
    flat = np.concatenate(vecs)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(flat.reshape(-1), pa.float32()), dim
    ).cast(t.schema.field("embedding").type)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(vec_id, pa.int64()),
                "embedding": emb,
                "label": pa.array(np.concatenate(labels), pa.int32()),
            },
            schema=t.schema,
        ),
        os.path.join(out_dir, "embeddings.parquet"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/testdata/sf1")
    ap.add_argument("--repl", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    counts = {}
    for name in ("customer", "supplier", "part", "orders", "events"):
        counts[name] = pq.ParquetFile(
            os.path.join(args.base, f"{name}.parquet")
        ).metadata.num_rows
    ev = pq.read_table(os.path.join(args.base, "events.parquet"),
                       columns=["user_id"])
    counts["_users"] = int(ev["user_id"].to_numpy().max()) + 1

    for name in ("region", "nation"):
        pq.write_table(
            pq.read_table(os.path.join(args.base, f"{name}.parquet")),
            os.path.join(args.out, f"{name}.parquet"),
        )
        print(f"{name}: copied")
    for name in KEYMAP:
        replicate_table(name, args.base, args.out, args.repl, counts)
        n = pq.ParquetFile(
            os.path.join(args.out, f"{name}.parquet")
        ).metadata.num_rows
        print(f"{name}: {n} rows")
    gen_documents(args.base, args.out, args.repl)
    gen_embeddings(args.base, args.out, args.repl)
    print("documents + embeddings written")


if __name__ == "__main__":
    main()
