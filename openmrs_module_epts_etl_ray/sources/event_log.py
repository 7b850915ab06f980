"""Change-event-log sources (FIXTURES.md F2 shape).

Two deterministic producers:

- :func:`events_from_documents` — derives a small CDC event log from the
  driver's ``documents`` table with arithmetic that an ANSI-SQL oracle can
  mirror exactly (used by the correctness gate).
- :func:`synthesize_event_log` — a seeded, sharded, zipf-skewed generator for
  arbitrary event counts. Generation is itself a Ray Data pipeline
  (``range(n_shards) -> map_batches``) so a 10^10-event log is produced
  distributed, one shard per task, with per-shard seeds — deterministic
  regardless of parallelism.

Schema (F2): lsn:int64, op:string, repo:string, path:string, commit:string,
lang:string, content:string — content/lang null for deletes. Analogue of the
reference's stage record ``common/model/EtlStageRecordVO.java:36-67`` with
LSN playing the role of the monotone ``observationDateFields`` ordering.
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

LANGS = np.array(["py", "java", "js", "rs", "go", "md"])

EVENT_SCHEMA = pa.schema(
    [
        ("lsn", pa.int64()),
        ("op", pa.string()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)


# ---------------------------------------------------------------------------
# documents -> events (SQL-mirrorable; see __ray_entry__.oracle_sql)
# ---------------------------------------------------------------------------

def _doc_events_batch(batch: pa.Table) -> pa.Table:
    """Expand each document row into its deterministic version history.

    For doc_id d: versions v = 0..(d % 4); lsn = d*10 + v; the last version is
    a delete iff d % 7 == 0; key = (repo='r'||d%97, path='f/'||d). Mirrored
    exactly by the `cdc_replay_lww` oracle SQL.
    """
    doc_id = batch["doc_id"].to_numpy()
    text = batch["text"].to_numpy(zero_copy_only=False)
    lang = batch["lang"].to_numpy(zero_copy_only=False)

    n_versions = doc_id % 4
    reps = n_versions + 1
    d = np.repeat(doc_id, reps)
    t = np.repeat(text, reps)
    lg = np.repeat(lang, reps)
    v = np.concatenate([np.arange(n + 1) for n in n_versions]) if len(doc_id) else np.array([], dtype=np.int64)

    lsn = d * 10 + v
    is_delete = (v == d % 4) & (d % 7 == 0)
    op = np.where(is_delete, "delete", np.where(v == 0, "insert", "update"))

    content = np.char.add(np.char.add(t.astype(str), "::v"), v.astype(str)).astype(object)
    content[is_delete] = None
    lang_out = lg.astype(object)
    lang_out[is_delete] = None

    # commit = sha256('c' || lsn)[:40], hashed buffer-direct through the
    # shared Arrow kernel (the old per-row hashlib list comp was the last
    # Python-per-row loop on the flagship input path)
    import pyarrow.compute as pc

    from ..functions.hashing import sha256_hex

    commit_src = pa.array(np.char.add("c", lsn.astype(str)).astype(object),
                          type=pa.string())
    commit = pc.utf8_slice_codeunits(sha256_hex(commit_src), 0, 40)

    return pa.table(
        {
            "lsn": pa.array(lsn, type=pa.int64()),
            "op": pa.array(op.astype(object), type=pa.string()),
            "repo": pa.array(np.char.add("r", (d % 97).astype(str)).astype(object), type=pa.string()),
            "path": pa.array(np.char.add("f/", d.astype(str)).astype(object), type=pa.string()),
            "commit": commit,
            "lang": pa.array(lang_out, type=pa.string()),
            "content": pa.array(content, type=pa.string()),
        }
    )


def events_from_documents(sf_dir: str) -> rd.Dataset:
    """Deterministic CDC event log derived from ``documents.parquet``.

    Byte-proportional read blocks (``read_table``) — Ray's cpu-count default
    split a single-digit-MB documents table into 64 micro-blocks, and every
    downstream barrier (partial-LWW, bucket groupby) then paid 64 tasks of
    launch overhead per stage (measured: one LWW pass over the 12.5k-row
    sf0.1 log dropped 1.8 s -> 0.4 s warm after this change)."""
    from .tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return docs.map_batches(_doc_events_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Seeded synthetic generator (bench / large-scale tests)
# ---------------------------------------------------------------------------

class _ShardGenerator:
    """Generates one shard of the event log per input row (actor-pool stage).

    Key population is zipf-distributed over ``n_keys`` (FIXTURES.md F5 hot-key
    skew: a handful of mega-repos hold most events). ``dup_rate`` emits
    duplicate-LSN replays (must be idempotent); events within a shard are
    shuffled (out-of-order delivery — replay must be order-independent).
    """

    def __init__(self, n_events: int, n_keys: int, n_shards: int, seed: int,
                 zipf_s: float, p_update: float, p_delete: float, dup_rate: float):
        self.n_events = n_events
        self.n_keys = n_keys
        self.n_shards = n_shards
        self.seed = seed
        self.zipf_s = zipf_s
        self.p_update = p_update
        self.p_delete = p_delete
        self.dup_rate = dup_rate
        # zipf-ish rank weights, computed once per actor
        ranks = np.arange(1, n_keys + 1, dtype=np.float64)
        w = ranks ** (-zipf_s)
        self.cum_w = np.cumsum(w / w.sum())

    def __call__(self, batch: dict) -> pa.Table:
        out = [self._shard(int(sid)) for sid in batch["id"]]
        return pa.concat_tables(out) if len(out) > 1 else out[0]

    def _shard(self, shard_id: int) -> pa.Table:
        per = self.n_events // self.n_shards
        lo = shard_id * per
        n = per if shard_id < self.n_shards - 1 else self.n_events - lo
        rng = np.random.default_rng((self.seed, shard_id))

        lsn = lo + np.arange(n, dtype=np.int64)
        # clip: cumsum(w/sum) can land at 0.999...9 < 1.0, so a draw in
        # that last sliver would index one past the key population
        key_idx = np.minimum(np.searchsorted(self.cum_w, rng.random(n)),
                             self.n_keys - 1)
        u = rng.random(n)
        op = np.where(u < self.p_delete, "delete",
                      np.where(u < self.p_delete + self.p_update, "update", "insert"))

        repo = np.char.add("org", (key_idx % 701).astype(str))
        path = np.char.add(np.char.add("src/f", (key_idx // 701).astype(str)), ".py")
        lang = LANGS[key_idx % len(LANGS)].astype(object)
        # deterministic pseudo-code content: cheap vectorized string build
        body = np.char.add(
            np.char.add("def fn_", key_idx.astype(str)),
            np.char.add("():\n    return ", lsn.astype(str)),
        )
        pad = rng.integers(0, 8, n)
        content = np.char.add(body, np.char.multiply("\n# pad pad pad", pad)).astype(object)
        commit = np.char.zfill(np.char.mod("%x", lsn), 40).astype(object)

        is_del = op == "delete"
        content[is_del] = None
        lang[is_del] = None

        t = pa.table(
            {
                "lsn": pa.array(lsn),
                "op": pa.array(op.astype(object), type=pa.string()),
                "repo": pa.array(repo.astype(object), type=pa.string()),
                "path": pa.array(path.astype(object), type=pa.string()),
                "commit": pa.array(commit, type=pa.string()),
                "lang": pa.array(lang, type=pa.string()),
                "content": pa.array(content, type=pa.string()),
            }
        )
        # duplicate-LSN replays + out-of-order delivery
        n_dup = int(n * self.dup_rate)
        if n_dup:
            dup_idx = rng.integers(0, n, n_dup)
            t = pa.concat_tables([t, t.take(dup_idx)])
        perm = rng.permutation(len(t))
        return t.take(perm)


def synthesize_event_log(
    n_events: int,
    *,
    n_keys: int = 10_000,
    n_shards: int = 64,
    seed: int = 42,
    zipf_s: float = 1.2,
    p_update: float = 0.35,
    p_delete: float = 0.05,
    dup_rate: float = 0.01,
) -> rd.Dataset:
    """Distributed deterministic event-log generation as a Dataset."""
    import ray

    pool = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    shards = rd.range(n_shards).repartition(n_shards)
    return shards.map_batches(
        _ShardGenerator,
        fn_constructor_kwargs=dict(
            n_events=n_events, n_keys=n_keys, n_shards=n_shards, seed=seed,
            zipf_s=zipf_s, p_update=p_update, p_delete=p_delete, dup_rate=dup_rate,
        ),
        batch_format="numpy",
        batch_size=1,
        concurrency=(1, min(n_shards, pool)),
    )


def write_event_log(ds: rd.Dataset, path: str) -> str:
    ds.write_parquet(path)
    return path
