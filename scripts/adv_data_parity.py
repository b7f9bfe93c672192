#!/usr/bin/env python
"""Adversarial-DATA parity sweep (r13): corrupt the documents and
embeddings tables the way a real 100 TB corpus is corrupt — NULL text,
empty text, whitespace-only text, NULL lang/source, NULL embeddings,
empty vectors, wrong-dimension vectors — then run every corpus-surface
spec (names l*/c*) AND its DuckDB oracle on the SAME corrupted tables
and compare value hashes.

This is one level stronger than the r12/r13 no-crash probes: a green row
proves the operator's null/edge SEMANTICS match ANSI SQL, not merely
that it survives. A crash is a stage-killer bug; a mismatch is a
cross-engine null-semantics divergence to triage.

The r14 chain-warehouse leg (VERDICT r13 directive 1) lives as REGISTERED
specs rather than in this script, because the chain tables are
formula-generated fixtures, not parquet inputs: t3x/t45x/t4678x (dirty
decode fixture, plans/decode_specs.py) and o1x/o2x (dirty raw_blocks
backfill + streaming tail, plans/maintenance_specs.py) corrupt the
fixture generation itself — NULL calldata/recipients/timestamps/hashes,
truncated and odd-length input, lying batch count words — identically on
both engines, so the driver re-witnesses the corrupt-chain parity every
rotation instead of only when this script runs. A per-family subset of
THIS script's corrupted-table sweep runs in pytest on every push
(tests/test_adversarial_sweep.py, VERDICT r13 directive 4).

Usage: python scripts/adv_data_parity.py  (prints one line per spec)
"""
from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SRC = os.environ.get("ADV_SF_DIR", "/root/testdata/sf0.001")
DST = os.environ.get("ADV_OUT_DIR", "/tmp/r13/sf_adv")
CKPT = os.path.join(DST, "_results.json")


def build_corrupted_dir(src: str = None, dst: str = None) -> None:
    """Write the corrupted twins of every table under ``dst`` (defaults to
    the env-configured sweep dirs; tests pass a tmp dir). Corruption is
    id-keyed and deterministic, so both engines see identical bytes."""
    SRC, DST = src or globals()["SRC"], dst or globals()["DST"]
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    # events (r13 second leg): null event time / user / type / value —
    # what a real event stream contains; probes the temporal/window/
    # verify surface (as-of joins, gap checks, watermark windows), where
    # NULL-ordering in windows is a known cross-engine trap. Arms 6-9
    # (r14 numeric-extremes leg): NaN / +-Infinity / 1e308 measure values
    # — IEEE semantics are where engines classically diverge (NaN
    # equality, NaN-vs-NULL ordering, Inf arithmetic, sum overflow to
    # Inf), and a 100 TB telemetry stream WILL contain them. Arms 10-13
    # (r14 temporal-extremes leg): the parquet-NANOS domain edges
    # (1677-09-21 / 2262-04-11), a PRE-EPOCH fractional second (floor
    # and truncate-toward-zero disagree below 1970 — the classic
    # negative-epoch trap), and epoch zero itself; a corrupt device
    # clock produces exactly these, and one far-future row is a
    # watermark poisoner.
    # arm 14 (r14 duplicate-delivery leg): the row takes its victim's id
    # AND timestamp (self-join on event_id - 5) but keeps its own
    # user/type/value/props — a retried ingest delivering the same event
    # key twice with different content, the EXACT-(ts, id)-tie shape.
    # Everything that assumes (ts, event_id) is a total order (sequence
    # verifiers, ORDER BY ... LIMIT fixture windows, row_number ranks,
    # as-of outputs keyed by event_id) meets real duplicates; any
    # divergence means an operator or oracle makes an ARBITRARY pick
    # among tied rows.
    con.execute(f"""
        COPY (
            -- arm 15 (r16 NULL-primary-key leg, mirroring documents arm
            -- 8): a healthy event under a NULL event_id — probes the
            -- temporal/window/verify family, where NULL keys meet
            -- sequence checks, as-of tiebreakers, and window ordering.
            SELECT CASE WHEN e.event_id % 29 = 14 THEN e.event_id - 5
                        WHEN e.event_id % 29 = 15 THEN NULL
                        ELSE e.event_id END AS event_id,
                   CASE WHEN e.event_id % 29 = 14 THEN v.ts
                        WHEN e.event_id % 29 = 0 THEN NULL
                        WHEN e.event_id % 29 = 10 THEN TIMESTAMP '1677-09-21 00:12:44.5'
                        WHEN e.event_id % 29 = 11 THEN TIMESTAMP '1969-12-31 23:58:30.5'
                        WHEN e.event_id % 29 = 12 THEN TIMESTAMP '2262-04-11 23:47:16'
                        WHEN e.event_id % 29 = 13 THEN TIMESTAMP '1970-01-01 00:00:00'
                        ELSE e.ts END AS ts,
                   CASE WHEN e.event_id % 29 = 1 THEN NULL ELSE e.user_id END AS user_id,
                   CASE WHEN e.event_id % 29 = 2 THEN NULL ELSE e.event_type END AS event_type,
                   CASE WHEN e.event_id % 29 = 3 THEN NULL
                        WHEN e.event_id % 29 = 6 THEN 'NaN'::DOUBLE
                        WHEN e.event_id % 29 = 7 THEN 'Infinity'::DOUBLE
                        WHEN e.event_id % 29 = 8 THEN '-Infinity'::DOUBLE
                        WHEN e.event_id % 29 = 9 THEN 1e308
                        ELSE e.value END AS value,
                   CASE WHEN e.event_id % 29 = 4 THEN NULL
                        WHEN e.event_id % 29 = 5 THEN '{{broken json'
                        ELSE e.props END AS props
            -- the victim (event_id - 5) is always ≡ 9 (mod 29): its own ts
            -- arm never fires, so its raw ts IS its post-corruption ts and
            -- the duplicate pair ties EXACTLY on (ts, event_id)
            FROM read_parquet('{SRC}/events.parquet') e
            LEFT JOIN read_parquet('{SRC}/events.parquet') v
              ON v.event_id = e.event_id - 5
        ) TO '{DST}/events.parquet' (FORMAT PARQUET)
    """)
    # ADVICE r14 item 1: arm 14 plants exact (ts, event_id) duplicate
    # pairs, so the o2b/o2c/o2e/o2f fixture windows carry content
    # tiebreakers — ORDER BY (ts, event_id, user_id[, event_type in o2b]).
    # That chain is deliberately NOT a total order (user_id/event_type are
    # low-cardinality, and pairs DO collide at sf0.001/sf0.01); it doesn't
    # need to be, because the four windows project ONLY functions of
    # exactly those chain columns (fp/key = user_id % M; event_type) — any
    # rows still tied after the chain are IDENTICAL in every projected
    # column, so an engine-arbitrary rank/LIMIT assignment between them is
    # unobservable. The tripwire below guards the two ways that argument
    # can rot: (a) a future corruption arm planting FULLY identical rows
    # would surface here first (read this comment, then relax knowingly);
    # (b) if an o2* window ever projects value/props, extend the GROUP BY
    # below to the new chain and re-run — a full-content tie group is the
    # only shape whose window placement could silently diverge.
    ties = con.execute(f"""
        SELECT count(*) FROM (
            SELECT 1 FROM read_parquet('{DST}/events.parquet')
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
            GROUP BY ts, event_id, user_id, event_type, props,
                     CAST(value AS VARCHAR)
            HAVING count(*) > 1)
    """).fetchone()[0]
    assert ties == 0, (
        f"{ties} fully-identical event rows on the dirty table — window "
        "membership for them is engine-arbitrary only if a fixture window "
        "projects beyond (user_id, event_type); see comment above"
    )
    # TPC-H tables (r13 third leg): null dates, flags, measures and
    # foreign keys in lineitem/orders — integrity violations a real
    # warehouse ingest produces; probes the relational surface's
    # null-grouping/joining/windowing parity. Arms 4-7 / 3-4 (r14
    # numeric-extremes leg): NaN / 1e308 / -Infinity MEASURES — one such
    # row made every plain double→decimal ledger cast a stage-killer
    # (Spark ANSI NUMERIC_VALUE_OUT_OF_RANGE, DuckDB NaN-cast error),
    # which is why the ledger-cast contract exists (plans/relational.py).
    con.execute(f"""
        COPY (
            SELECT * REPLACE (
                -- arm 8 (r16 NULL-primary-key leg): a NULL l_orderkey on
                -- an otherwise healthy line item — probes the TPC-H/top-k
                -- surface, where key tiebreakers meet NULLS FIRST/LAST
                CASE WHEN l_orderkey % 31 = 8 THEN NULL ELSE l_orderkey END AS l_orderkey,
                CASE WHEN l_orderkey % 31 = 0 THEN NULL ELSE l_shipdate END AS l_shipdate,
                CASE WHEN l_orderkey % 31 = 1 THEN NULL ELSE l_returnflag END AS l_returnflag,
                CASE WHEN l_orderkey % 31 = 2 THEN NULL
                     WHEN l_orderkey % 31 = 4 THEN 'NaN'::DOUBLE
                     ELSE l_quantity END AS l_quantity,
                CASE WHEN l_orderkey % 31 = 3 THEN NULL ELSE l_suppkey END AS l_suppkey,
                CASE WHEN l_orderkey % 31 = 5 THEN 1e308
                     WHEN l_orderkey % 31 = 6 THEN '-Infinity'::DOUBLE
                     ELSE l_extendedprice END AS l_extendedprice,
                CASE WHEN l_orderkey % 31 = 7 THEN 'Infinity'::DOUBLE
                     ELSE l_discount END AS l_discount
            )
            FROM read_parquet('{SRC}/lineitem.parquet')
        ) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
            SELECT * REPLACE (
                -- arm 5 (r16 NULL-primary-key leg, mirroring lineitem)
                CASE WHEN o_orderkey % 37 = 5 THEN NULL ELSE o_orderkey END AS o_orderkey,
                CASE WHEN o_orderkey % 37 = 0 THEN NULL ELSE o_orderdate END AS o_orderdate,
                CASE WHEN o_orderkey % 37 = 1 THEN NULL ELSE o_custkey END AS o_custkey,
                CASE WHEN o_orderkey % 37 = 2 THEN NULL ELSE o_orderstatus END AS o_orderstatus,
                CASE WHEN o_orderkey % 37 = 3 THEN 'NaN'::DOUBLE
                     WHEN o_orderkey % 37 = 4 THEN 1e308
                     ELSE o_totalprice END AS o_totalprice
            )
            FROM read_parquet('{SRC}/orders.parquet')
        ) TO '{DST}/orders.parquet' (FORMAT PARQUET)
    """)
    # dimension tables (r13 fourth leg): null attributes and FKs in
    # customer/part/supplier — probes the join/pruning/top-k surface.
    con.execute(f"""
        COPY (
            SELECT * REPLACE (
                CASE WHEN c_custkey % 43 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment,
                CASE WHEN c_custkey % 43 = 1 THEN NULL ELSE c_nationkey END AS c_nationkey
            )
            FROM read_parquet('{SRC}/customer.parquet')
        ) TO '{DST}/customer.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
            SELECT * REPLACE (
                CASE WHEN p_partkey % 43 = 0 THEN NULL ELSE p_type END AS p_type,
                CASE WHEN p_partkey % 43 = 1 THEN NULL ELSE p_brand END AS p_brand,
                CASE WHEN p_partkey % 43 = 2 THEN NULL ELSE p_size END AS p_size
            )
            FROM read_parquet('{SRC}/part.parquet')
        ) TO '{DST}/part.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
            SELECT * REPLACE (
                CASE WHEN s_suppkey % 17 = 0 THEN NULL ELSE s_nationkey END AS s_nationkey
            )
            FROM read_parquet('{SRC}/supplier.parquet')
        ) TO '{DST}/supplier.parquet' (FORMAT PARQUET)
    """)
    # documents: cycle of corruptions keyed on doc_id so both engines see
    # the identical corrupted bytes (deterministic, no RNG). Arms 5-7
    # (r14 multibyte leg): a 100 TB corpus is MULTILINGUAL — CJK, emoji,
    # combining accents, RTL — and char-length/substring/case/regex
    # semantics are where engines classically diverge; n_chars keeps its
    # ORIGINAL value so the metadata also lies about the new text.
    # arm 8 (r16 NULL-primary-key leg): a NULL doc_id on an otherwise
    # healthy row — failed id extraction upstream is how a real crawl is
    # corrupt. This is where Spark (ORDER BY ASC = NULLS FIRST) and
    # DuckDB (NULLS LAST) classically diverge the moment a NULL key
    # reaches an ordering, window partition, or hash gate — Rule 1 says
    # every operator must EXCLUDE undefined identities explicitly, and
    # this arm enforces it sweep-wide.
    con.execute(f"""
        COPY (
            SELECT CASE WHEN doc_id % 23 = 8 THEN NULL
                        ELSE doc_id END AS doc_id,
                   CASE doc_id % 23
                        WHEN 0 THEN NULL
                        WHEN 1 THEN ''
                        WHEN 2 THEN '   '
                        WHEN 5 THEN '你好 世界 数据 清洗 你好 世界 清洗 数据'
                        WHEN 6 THEN 'café naïve déjà vu 🚀 café naïve 🎉 🚀'
                        WHEN 7 THEN concat(text, ' 你好 مرحبا é')
                        ELSE text END AS text,
                   CASE WHEN doc_id % 23 = 3 THEN NULL ELSE lang END AS lang,
                   CASE WHEN doc_id % 23 = 4 THEN NULL ELSE source END AS source,
                   n_chars
            FROM read_parquet('{SRC}/documents.parquet')
        ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        -- arms 4-6 (r14 numeric-extremes leg): non-finite ELEMENTS inside
        -- otherwise-plausible vectors — no agreed similarity exists for
        -- them (any dot product is NaN/Inf), so like element-NULLs they
        -- must be excluded by the validity gate on BOTH engines.
        -- arm 7 (r16 NULL-primary-key leg, mirroring documents arm 8):
        -- a healthy vector under a NULL vec_id.
        COPY (
            SELECT CASE WHEN vec_id % 19 = 7 THEN NULL
                        ELSE vec_id END AS vec_id,
                   CASE vec_id % 19
                        WHEN 0 THEN NULL
                        WHEN 1 THEN []::FLOAT[]
                        WHEN 2 THEN embedding[1:3]
                        WHEN 3 THEN list_append(embedding[1:63], CAST(NULL AS FLOAT))
                        WHEN 4 THEN list_append(embedding[1:63], 'NaN'::FLOAT)
                        WHEN 5 THEN list_append(embedding[1:63], 'Infinity'::FLOAT)
                        WHEN 6 THEN list_append(embedding[1:63], '-Infinity'::FLOAT)
                        ELSE embedding END AS embedding,
                   label
            FROM read_parquet('{SRC}/embeddings.parquet')
        ) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
    """)
    for f in os.listdir(SRC):
        dst = os.path.join(DST, f)
        if f.endswith(".parquet") and not os.path.exists(dst):
            shutil.copyfile(os.path.join(SRC, f), dst)


def main() -> None:
    build_corrupted_dir()
    from core_etl_spark.plans import REGISTRY
    from core_etl_spark.session import get_spark
    from tests.parity import duck_connection, compare

    try:
        with open(CKPT) as f:
            state = json.load(f)
    except (OSError, ValueError):
        state = {}

    spark = get_spark(app_name="adv_data_parity")
    con = duck_connection(DST)
    scope = os.environ.get("ADV_SCOPE", "corpus")
    if scope == "corpus":
        names = [n for n in sorted(REGISTRY) if n[0] in "lc" and n[1].isdigit()]
    else:  # "all": the events leg — every registry spec on the corrupted dir
        names = sorted(REGISTRY)
    print(f"{len(names)} specs in scope={scope}; {len(state)} cached", flush=True)
    import time
    deadline = time.time() + 520
    for name in names:
        if name in state:
            continue
        spec = REGISTRY[name]
        try:
            sdf = spec.builder(spark, DST)
            if spec.oracle is None:
                state[name] = {"status": "rows_only", "rows": sdf.count()}
            else:
                problems = compare(sdf, con.execute(spec.oracle).fetchdf())
                state[name] = {
                    "status": "OK" if not problems else "MISMATCH",
                    "detail": None if not problems else str(problems)[:300],
                }
        except Exception as e:  # noqa: BLE001 — a crash IS the finding
            state[name] = {
                "status": "CRASH",
                "detail": f"{type(e).__name__}: {e}"[:300],
            }
        tmp = CKPT + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1)
        os.replace(tmp, CKPT)
        print(name, state[name]["status"],
              state[name].get("detail") or "", flush=True)
        if time.time() > deadline:
            print("TIME CAP — resumable, re-run", flush=True)
            return
    bad = {k: v for k, v in state.items() if v["status"] not in ("OK", "rows_only")}
    print("SWEEP COMPLETE; problems:", json.dumps(bad, indent=1) if bad else "none",
          flush=True)


if __name__ == "__main__":
    main()
