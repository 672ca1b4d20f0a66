"""Generate a larger scale factor from an existing testdata dir —
the local harness for the sf-scaling check (catching hidden
quadratics that plan lint can't see, e.g. in-bucket pair explosion
under skewed buckets).

    python tools/gen_scale_data.py /root/testdata/sf0.1 \
        /root/repo/.scale/sf1 10

Faithful-by-construction scaling, not naive replication where that
would distort operator behavior:

- ``region``/``nation``: fixed dims, copied verbatim (as at every
  driver SF).
- ``customer supplier part orders lineitem events``: K replicas
  with coherent key offsets (each replica is an independent shard
  of the same shape — referential integrity, join fan-outs, and
  value distributions preserved exactly; no artificial hot keys).
  Event timestamps keep their window (scaling = more users in the
  same period), so watermark/sessionize group sizes grow the way a
  real corpus's would.
- ``documents``: REGENERATED, not replicated — naive text copies
  would plant K exact duplicates of every doc and blow up every
  LSH bucket by K², mis-measuring exactly the operators this check
  exists to audit. New docs sample the source's unigram
  distribution with the source's empirical length and
  (lang, source) joint distributions; exact-duplicate pairs are
  planted at the measured source rate.
- ``embeddings``: per-label Gaussian fit (mean/std per dim) →
  sample, L2-normalize (source vectors are unit-norm), preserving
  the cluster structure IVF/kmeans depend on.

Everything is written through pyarrow with the SOURCE's arrow
schema, so physical types round-trip exactly (including the events
table's TIMESTAMP(NANOS) quirk the catalog loader special-cases).
Deterministic: seed fixed, one RNG stream per table.

Each scaled table is written as a DIRECTORY of ``N_FILES`` part
files (default 32), not one parquet file: a single file gives Spark
2-3 input splits, capping every scan/map stage at 2-3 of 32 cores
and inflating the measured exponent of CPU-heavy map stages with a
harness artifact (the r7 SCALING.md caveat — winnow 0.84,
sessionize 0.70 were mostly THIS). 32 files = full local[32] scan
parallelism, which is also the honest cluster shape: a 100 TB table
is thousands of splits, never one.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SEED = 42
N_FILES = 32


def _write_sharded(out: pa.Table, dst: str, table: str, n_files: int = N_FILES) -> None:
    """Write ``out`` as <dst>/<table>.parquet/part-000NN.parquet —
    a directory both Spark and pyarrow read transparently, with
    enough splits to use every core."""
    d = os.path.join(dst, f"{table}.parquet")
    os.makedirs(d, exist_ok=True)
    n = out.num_rows
    if n == 0:
        # an empty DIRECTORY is unreadable (no schema to infer); one
        # schema-bearing empty file keeps the dataset loadable
        pq.write_table(out, os.path.join(d, "part-00000.parquet"))
        return
    n_files = max(1, min(n_files, n))  # never emit empty shards
    per = -(-n // n_files)  # ceil
    for i in range(n_files):
        lo = i * per
        if lo >= n:
            break
        pq.write_table(
            out.slice(lo, min(per, n - lo)),
            os.path.join(d, f"part-{i:05d}.parquet"),
        )

REPLICATE_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}

# offsets must be consistent across tables: o_custkey offsets by the
# CUSTOMER key span, l_partkey by the PART span, etc.
KEY_SPAN_TABLE = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
}


def _span(src: str, table: str, col: str, cache: dict) -> int:
    k = (table, col)
    if k not in cache:
        t = pq.read_table(os.path.join(src, f"{table}.parquet"), columns=[col])
        cache[k] = int(pc.max(t.column(0)).as_py()) + 1
    return cache[k]


def replicate(
    src: str, dst: str, table: str, k_factor: int, mode: str = "keys"
) -> int:
    """``mode='keys'`` (default): every identity key is offset per
    replica — the key SPACES grow K× while rows-per-key stay constant
    (the shape of a real corpus growing: more users, more customers).
    ``mode='rows'``: the events table's ``user_id`` is NOT offset —
    the user population stays fixed and rows-per-user grow K×
    (event_id still offsets, so rows stay unique). The two corpora
    bracket the window-partition question the SF audit measures: does
    a per-user window's cost profile depend on whether growth comes
    as wider key spaces (more window partitions) or deeper keys
    (bigger partitions)? All other tables keep key offsets in both
    modes (referential integrity)."""
    t = pq.read_table(os.path.join(src, f"{table}.parquet"))
    offset_keys = set(REPLICATE_KEYS[table])
    if mode == "rows" and table == "events":
        offset_keys.discard("user_id")
    spans: dict = {}
    chunks = [t]
    for k in range(1, k_factor):
        cols = []
        for name in t.schema.names:
            col = t.column(name)
            if name in offset_keys:
                span_t, span_c = KEY_SPAN_TABLE[name]
                off = k * _span(src, span_t, span_c, spans)
                col = pc.add(col, pa.scalar(off, type=col.type))
            cols.append(col)
        chunks.append(pa.table(dict(zip(t.schema.names, cols)), schema=t.schema))
    out = pa.concat_tables(chunks)
    _write_sharded(out, dst, table)
    return out.num_rows


def gen_documents(src: str, dst: str, factor: int) -> int:
    rng = np.random.default_rng(SEED)
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    tok_lists = [s.split() for s in texts]
    lengths = np.array([len(x) for x in tok_lists])
    vocab, counts = np.unique(
        np.concatenate([np.array(x) for x in tok_lists if x]), return_counts=True
    )
    word_p = counts / counts.sum()
    pair_idx = rng.choice(len(langs), size=len(langs))
    n_new = len(texts) * factor
    # exact-duplicate rate measured from the source (planted pairs)
    uniq = len(set(texts))
    dup_rate = (len(texts) - uniq) / len(texts)
    new_lengths = rng.choice(lengths, size=n_new)
    ls_pick = rng.choice(len(langs), size=n_new)
    words = rng.choice(vocab, size=int(new_lengths.sum()), p=word_p)
    out_texts = []
    pos = 0
    for L in new_lengths:
        out_texts.append(" ".join(words[pos : pos + L]))
        pos += L
    n_dups = int(round(dup_rate * n_new))
    for i in rng.choice(np.arange(1, n_new), size=n_dups, replace=False):
        out_texts[i] = out_texts[rng.integers(0, i)]
    del pair_idx
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_new), type=t.schema.field("doc_id").type),
            "text": pa.array(out_texts, type=t.schema.field("text").type),
            "lang": pa.array(
                [langs[i] for i in ls_pick], type=t.schema.field("lang").type
            ),
            "source": pa.array(
                [sources[i] for i in ls_pick], type=t.schema.field("source").type
            ),
            "n_chars": pa.array(
                [len(s) for s in out_texts], type=t.schema.field("n_chars").type
            ),
        },
        schema=t.schema,
    )
    _write_sharded(tbl, dst, "documents")
    return n_new


def gen_embeddings(src: str, dst: str, factor: int) -> int:
    rng = np.random.default_rng(SEED + 1)
    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    labels = np.array(t.column("label").to_pylist())
    n_new = len(labels) * factor
    new_labels = rng.choice(labels, size=n_new)
    dim = vecs.shape[1]
    out = np.empty((n_new, dim))
    for lab in np.unique(labels):
        mask = new_labels == lab
        sub = vecs[labels == lab]
        mu, sd = sub.mean(axis=0), sub.std(axis=0) + 1e-9
        out[mask] = rng.normal(mu, sd, size=(int(mask.sum()), dim))
    out /= np.linalg.norm(out, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(
                np.arange(n_new), type=t.schema.field("vec_id").type
            ),
            "embedding": pa.array(
                [row.astype(np.float32) for row in out],
                type=t.schema.field("embedding").type,
            ),
            "label": pa.array(new_labels, type=t.schema.field("label").type),
        },
        schema=t.schema,
    )
    _write_sharded(tbl, dst, "embeddings")
    return n_new


def main() -> None:
    mode = "keys"
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--mode="):
            mode = a.split("=", 1)[1]
            assert mode in ("keys", "rows"), mode
        else:
            args.append(a)
    src, dst = args[0], args[1]
    factor = int(args[2]) if len(args) > 2 else 10
    emb_factor = int(args[3]) if len(args) > 3 else 4
    os.makedirs(dst, exist_ok=True)
    for dim in ("region", "nation"):
        pq.write_table(
            pq.read_table(os.path.join(src, f"{dim}.parquet")),
            os.path.join(dst, f"{dim}.parquet"),
        )
        print(f"{dim}: copied")
    for table in REPLICATE_KEYS:
        n = replicate(src, dst, table, factor, mode)
        print(f"{table}: {n} rows ({mode})")
    print(f"documents: {gen_documents(src, dst, factor)} rows")
    print(f"embeddings: {gen_embeddings(src, dst, emb_factor)} rows")


if __name__ == "__main__":
    main()
