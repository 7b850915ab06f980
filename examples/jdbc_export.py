"""Executable live-DB -> lake migration recipe (README "Migrating from a
live-DB (JDBC) deployment", step 1), with stdlib ``sqlite3`` standing in
for the JDBC source — the same interval-paged read shape the reference's
table reader uses (``utilities/db/conn/DBUtilities.java:952-972``
introspection + ``etl/model/EtlSearchParams.java`` paged SELECTs), minus
the driver jar.

Two output layouts, matching the two ways ``run_config`` consumes files:

- ``--layout sfdir`` (default): one ``<tableName>.parquet`` per table —
  the directory every ``srcConf.sfDir`` points at; column pruning and
  ``extraConditionForExtract`` then behave like the reference's SELECT.
- ``--layout export``: a per-table directory of JSON-lines page files —
  the §3.2 file-based sync export a ``LOAD``/``DB_QUICK_LOAD`` item's
  ``srcConf.importDir`` (or multi-origin ``sourceFolders``) reads.

Paging is key-interval based (``WHERE pk > ? ORDER BY pk LIMIT n``), so a
table of any size streams through bounded memory — each page lands as one
Parquet row group / one JSON file. Tables without an INTEGER PRIMARY KEY
page on sqlite's implicit ``rowid``.

Usage (run from the repo root)::

    python examples/jdbc_export.py --seed-demo --db /tmp/site_a.db \
        --out /tmp/site_a_export --layout export
    # then point a LOAD config's importDir at /tmp/site_a_export/customer

This file is stdlib + pyarrow only — no engine imports, no Ray — because
it models the exporter a reference user runs NEXT TO their database, not
inside the cluster.
"""
from __future__ import annotations

import argparse
import json
import os
import sqlite3
from typing import Iterator

import pyarrow as pa
import pyarrow.parquet as pq


def list_tables(conn: sqlite3.Connection) -> list[str]:
    """Schema introspection — the DBUtilities.getTableNames analogue."""
    rows = conn.execute(
        "SELECT name FROM sqlite_master WHERE type='table' "
        "AND name NOT LIKE 'sqlite_%' ORDER BY name").fetchall()
    return [r[0] for r in rows]


def paging_key(conn: sqlite3.Connection, table: str) -> str:
    """The interval-paging axis: the table's single INTEGER PRIMARY KEY if
    it has one, else sqlite's implicit rowid."""
    pks = [r for r in conn.execute(f'PRAGMA table_info("{table}")')
           if r[5] > 0]          # r[5] = pk ordinal (0 = not pk)
    if len(pks) == 1 and str(pks[0][2]).upper().startswith("INT"):
        return pks[0][1]
    return "rowid"


def arrow_schema(conn: sqlite3.Connection, table: str) -> pa.Schema:
    """One fixed Arrow schema per table from the DECLARED column types
    (sqlite type-affinity rules), so every page casts to the same schema
    — per-page inference would pin the ParquetWriter to whatever page 1
    happened to contain (an all-NULL first page infers ``null`` and the
    next page crashes the writer)."""
    fields = []
    for r in conn.execute(f'PRAGMA table_info("{table}")'):
        decl = str(r[2] or "").upper()
        if "INT" in decl:
            t = pa.int64()
        elif any(k in decl for k in ("CHAR", "CLOB", "TEXT")):
            t = pa.string()
        elif "BLOB" in decl or not decl:
            t = pa.binary()
        elif any(k in decl for k in ("REAL", "FLOA", "DOUB")):
            t = pa.float64()
        else:                       # NUMERIC affinity
            t = pa.float64()
        fields.append(pa.field(r[1], t))
    return pa.schema(fields)


def pages(conn: sqlite3.Connection, table: str, key: str,
          page_size: int) -> Iterator[pa.Table]:
    """Stream the table as Arrow pages: WHERE key > last ORDER BY key
    LIMIT n — each page is one bounded-memory unit of work. Every page
    carries the same declared-type schema (see ``arrow_schema``); the
    rowid paging axis never appears in the output."""
    schema = arrow_schema(conn, table)
    sel = ", ".join(f'"{c}"' for c in schema.names)
    if key == "rowid":
        sel = f"rowid, {sel}"
        keyexpr = "rowid"
    else:
        keyexpr = f'"{key}"'
    last = None
    while True:
        where = f"WHERE {keyexpr} > ?" if last is not None else ""
        args = (last, page_size) if last is not None else (page_size,)
        cur = conn.execute(
            f'SELECT {sel} FROM "{table}" {where} '
            f"ORDER BY {keyexpr} LIMIT ?", args)
        rows = cur.fetchall()
        if not rows:
            return
        if key == "rowid":
            last = rows[-1][0]
            rows = [r[1:] for r in rows]    # drop the paging axis
        else:
            last = rows[-1][schema.names.index(key)]
        yield pa.Table.from_pylist(
            [dict(zip(schema.names, r)) for r in rows], schema=schema)


def export_table(conn: sqlite3.Connection, table: str, out_dir: str,
                 layout: str, page_size: int) -> dict:
    key = paging_key(conn, table)
    n_rows = n_pages = 0
    if layout == "sfdir":
        path = os.path.join(out_dir, f"{table}.parquet")
        writer = None
        try:
            for page in pages(conn, table, key, page_size):
                if writer is None:
                    writer = pq.ParquetWriter(path, page.schema)
                writer.write_table(page)   # one row group per page
                n_rows += len(page)
                n_pages += 1
        finally:
            if writer is not None:
                writer.close()
        if writer is None:                 # empty table still gets a file
            pq.write_table(arrow_schema(conn, table).empty_table(), path)
        return {"table": table, "rows": n_rows, "pages": n_pages,
                "path": path}
    # export layout: JSON-lines page files, the LOAD importDir shape
    tdir = os.path.join(out_dir, table)
    os.makedirs(tdir, exist_ok=True)
    for page in pages(conn, table, key, page_size):
        fname = os.path.join(tdir, f"page-{n_pages:06d}.json")
        with open(fname, "w") as fh:
            for row in page.to_pylist():
                fh.write(json.dumps(row) + "\n")
        n_rows += len(page)
        n_pages += 1
    return {"table": table, "rows": n_rows, "pages": n_pages, "path": tdir}


def seed_demo(db_path: str, n: int = 500) -> None:
    """Deterministic demo site database (no RNG — the test and a user run
    get identical bytes)."""
    conn = sqlite3.connect(db_path)
    with conn:
        conn.execute("DROP TABLE IF EXISTS customer")
        conn.execute(
            "CREATE TABLE customer ("
            "customer_id INTEGER PRIMARY KEY, name TEXT, "
            "balance_cents INTEGER, updated_at TEXT)")
        conn.executemany(
            "INSERT INTO customer VALUES (?,?,?,?)",
            [(i,
              f"Customer #{i:04d}",
              (i * 7919) % 100000 - 5000,
              f"2026-01-{(i % 28) + 1:02d}T00:00:00")
             for i in range(1, n + 1)])
    conn.close()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--db", required=True, help="sqlite database path")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--layout", choices=("sfdir", "export"),
                    default="sfdir")
    ap.add_argument("--page-size", type=int, default=10_000)
    ap.add_argument("--tables", nargs="*",
                    help="subset of tables (default: all)")
    ap.add_argument("--seed-demo", action="store_true",
                    help="create a deterministic demo customer table first")
    args = ap.parse_args(argv)

    if args.seed_demo:
        seed_demo(args.db)
    conn = sqlite3.connect(args.db)
    os.makedirs(args.out, exist_ok=True)
    stats = [export_table(conn, t, args.out, args.layout, args.page_size)
             for t in (args.tables or list_tables(conn))]
    conn.close()
    print(json.dumps({"layout": args.layout, "tables": stats}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
