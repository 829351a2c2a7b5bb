"""Driver-contract query catalog: one Ray Data callable per operator from
SURVEY.md §2 (+ graft extensions), each paired with a DuckDB oracle SQL
string where SQL can express it (`__ray_entry__.queries()/oracle_sql()`).

Conventions (driver compares row-count + schema + order-insensitive
value-hash after sorting columns by name):
  * every computed/aggregate column is explicitly named, identically in the
    Ray result and the SQL (`AS n` etc.);
  * float aggregates are rounded identically on both sides;
  * int aggregates are cast to int64 on both sides (DuckDB sum(int) is
    HUGEINT otherwise).

Transcript queries run over a deterministic adversarial corpus (gaps +
mid-stream + duplicates) generated into /tmp keyed by sf dir —
``ensure_adv_corpus`` is called both inside each callable and eagerly at
catalog build so the oracle's ``read_parquet('<path>')`` always finds it.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..fixtures import generator as gen
from ..functions import ann, dedup, dicts, textstats
from ..sources.readers import read_table, read_transcripts
from ..stages.aggregate import bucketed_first_by, bucketed_groupby, partial_groupby
from ..stages.enrich import apply_enrich
from ..stages.parse import apply_parse
from ..stages.reassemble import apply_reassemble
from ..stages.route import add_sink_and_bucket

SF_CORRECTNESS = "/root/testdata/sf0.01"  # the driver's oracle scale


# ---------------------------------------------------------------------------
# adversarial transcript corpus (deterministic, cached per sf)
# ---------------------------------------------------------------------------

def adv_corpus_path(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) + "_adv"
    return gen.corpus_path(tag)


def adv_corpus_glob(sf_dir: str) -> str:
    """The DuckDB-side path (corpora are directories of part files)."""
    return os.path.join(adv_corpus_path(sf_dir), "*.parquet")


def ensure_adv_corpus(sf_dir: str) -> str:
    path = adv_corpus_path(sf_dir)
    if os.path.isdir(path):
        return path
    t, gt = gen.generate_transcripts(
        n_convs=gen.n_convs_for_sf(sf_dir), seed=42, compute_gt=False
    )
    t, _ = gen.with_gaps(t, None, frac_convs=0.05)
    t, _ = gen.with_midstream(t, None, frac_convs=0.05)
    t, _ = gen.with_duplicates(t, None, frac=0.03)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return gen.write_corpus_dir(t, path)


def sessions_corpus_path(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) + "_sessions"
    return gen.corpus_path(tag)


def ensure_sessions_corpus(sf_dir: str) -> str:
    """Clean multi-session transcript corpus (session column, turn_idx
    restarts per session would need generator support; here one session per
    conv with the epoch column materialized — exercises sink naming)."""
    path = sessions_corpus_path(sf_dir)
    if os.path.isdir(path):
        return path
    n = max(60, gen.n_convs_for_sf(sf_dir) // 10)
    t, _ = gen.generate_transcripts(n_convs=n, seed=42, with_session=True,
                                    compute_gt=False)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return gen.write_corpus_dir(t, path)


def _reassembled(sf_dir: str, num_buckets: int = 32):
    from .. import tuning

    tuning.configure()
    ds = read_transcripts(ensure_adv_corpus(sf_dir))
    ds = add_sink_and_bucket(ds, num_buckets=num_buckets)
    # parse AFTER the exchange (flagship layout: the shuffle ships raw
    # columns; per-row derivations happen on localized data)
    ds = apply_reassemble(ds)
    return apply_parse(ds)


# The oracle's dedup + contiguity gate, as reusable SQL CTEs over the
# adversarial corpus (duplicates are exact row copies → DISTINCT ≡
# first-wins; gate: turn_idx == min + row_number - 1 keeps exactly the
# contiguous prefix from the per-conv minimum — W2/W5 semantics).
def _gate_cte(path: str) -> str:
    return f"""
    WITH raw AS (
        SELECT DISTINCT conv_id, turn_idx, role, text, tool, ts
        FROM read_parquet('{path}')
    ), g AS (
        SELECT *,
               row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn,
               min(turn_idx) OVER (PARTITION BY conv_id) AS mn
        FROM raw
    ), routed AS (
        SELECT * FROM g WHERE turn_idx = mn + rn - 1
    )"""


# ---------------------------------------------------------------------------
# the catalog
# ---------------------------------------------------------------------------

def build_catalog():
    """Returns (queries: dict[str, callable], oracles: dict[str, str])."""
    queries: dict = {}
    oracles: dict = {}
    adv_path = adv_corpus_glob(SF_CORRECTNESS)
    sessions_glob = os.path.join(sessions_corpus_path(SF_CORRECTNESS), "*.parquet")

    def q(name, fn, sql=None):
        queries[name] = fn
        if sql is not None:
            oracles[name] = sql

    # ---------------- transcript pipeline (SURVEY §2.3/2.6/2.7/2.8) --------

    def t_event_counts(sf_dir):
        ds = apply_parse(read_transcripts(ensure_adv_corpus(sf_dir)))
        return partial_groupby(ds, ["event_type"], {"n": (None, "count")})

    q(
        "t_event_counts",
        t_event_counts,
        f"""SELECT coalesce(regexp_extract(text, 'event=(\\w+)', 1), 'msg') AS event_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM read_parquet('{adv_path}') GROUP BY 1""",
    )

    def t_error_codes(sf_dir):
        ds = apply_parse(read_transcripts(ensure_adv_corpus(sf_dir)))
        errs = ds.map_batches(
            lambda t: t.filter(pc.not_equal(t["error_code"], "")),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        return partial_groupby(errs, ["error_code"], {"n": (None, "count")})

    q(
        "t_error_codes",
        t_error_codes,
        f"""SELECT regexp_extract(text, '(ERR-\\d{{3}})', 1) AS error_code,
                   CAST(count(*) AS BIGINT) AS n
            FROM read_parquet('{adv_path}')
            WHERE regexp_matches(text, 'ERR-\\d{{3}}') GROUP BY 1""",
    )

    def t_sink_counts(sf_dir):
        """Per-sink counts — sink cardinality grows with the corpus, so the
        combine is distributed (bucketed_groupby), never a driver-side
        partial materialization."""
        ds = _reassembled(sf_dir)
        routed = ds.map_batches(
            lambda t: t.filter(pc.equal(t["status"], "routed")).select(
                ["sink", "counter"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return bucketed_groupby(
            routed, ["sink"],
            {"n_rows": (None, "count"), "max_counter": ("counter", "max")},
        )

    q(
        "t_sink_counts",
        t_sink_counts,
        _gate_cte(adv_path)
        + """SELECT conv_id AS sink, CAST(count(*) AS BIGINT) AS n_rows,
                    CAST(max(turn_idx) AS BIGINT) AS max_counter
             FROM routed GROUP BY 1""",
    )

    def t_routed_turns(sf_dir):
        ds = _reassembled(sf_dir)
        return ds.map_batches(
            lambda df: df[df["status"] == "routed"][
                ["conv_id", "turn_idx", "event_type", "counter"]
            ].astype({"turn_idx": "int64"}),
            batch_format="pandas",
        )

    q(
        "t_routed_turns",
        t_routed_turns,
        _gate_cte(adv_path)
        + """SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                    coalesce(regexp_extract(text, 'event=(\\w+)', 1), 'msg') AS event_type,
                    CAST(turn_idx AS BIGINT) AS counter
             FROM routed""",
    )

    def t_docs(sf_dir):
        from ..stages.aggregate import assemble_docs

        ds = _reassembled(sf_dir)
        docs = assemble_docs(ds)
        return docs.map_batches(
            lambda df: df[["conv_id", "assembled_text"]], batch_format="pandas"
        )

    q(
        "t_docs",
        t_docs,
        _gate_cte(adv_path)
        + """SELECT conv_id,
                    string_agg(text, chr(10) ORDER BY turn_idx) AS assembled_text
             FROM routed GROUP BY conv_id""",
    )

    def t_quarantine(sf_dir):
        ds = _reassembled(sf_dir)
        quar = ds.map_batches(
            lambda df: df[df["status"] == "quarantined"][
                ["conv_id", "first_missing_turn"]
            ],
            batch_format="pandas",
        )
        return bucketed_groupby(
            quar, ["conv_id"],
            {"first_missing_turn": ("first_missing_turn", "min")},
        )

    q(
        "t_quarantine",
        t_quarantine,
        _gate_cte(adv_path)
        + """SELECT conv_id,
                    CAST(min(mn + rn - 1) AS BIGINT) AS first_missing_turn
             FROM g WHERE turn_idx <> mn + rn - 1 GROUP BY conv_id""",
    )

    def t_role_class_counts(sf_dir):
        ds = apply_parse(read_transcripts(ensure_adv_corpus(sf_dir)))
        ds = apply_enrich(ds, concurrency=2)
        return partial_groupby(ds, ["role_class"], {"n": (None, "count")})

    cls_case, _ = dicts.roles_case_sql()
    q(
        "t_role_class_counts",
        t_role_class_counts,
        f"""SELECT CASE {cls_case} ELSE 'unknown' END AS role_class,
                   CAST(count(*) AS BIGINT) AS n
            FROM read_parquet('{adv_path}') GROUP BY 1""",
    )

    def t_tool_families(sf_dir):
        ds = apply_parse(read_transcripts(ensure_adv_corpus(sf_dir)))
        ds = apply_enrich(ds, concurrency=2)
        tools = ds.map_batches(
            lambda t: t.filter(pc.not_equal(t["tool_family"], "")),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        return partial_groupby(
            tools, ["tool_family", "tool_risk"], {"n": (None, "count")}
        )

    q(
        "t_tool_families",
        t_tool_families,
        f"""SELECT tools.tool_family, tools.risk AS tool_risk,
                   CAST(count(*) AS BIGINT) AS n
            FROM read_parquet('{adv_path}') p
            JOIN {dicts.tools_values_sql()}
              ON regexp_extract(p.tool, 'tool=(\\S+)', 1) = tools.tool_name
            GROUP BY 1, 2""",
    )

    # ---------------- generic relational operators (testdata tables) -------

    def lineitem_pricing_summary(sf_dir):
        ds = read_table(
            sf_dir, "lineitem",
            columns=["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "l_discount"],
        )

        def add_rev(t: pa.Table) -> pa.Table:
            rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
            return t.append_column("revenue", rev)

        ds = ds.map_batches(add_rev, batch_format="pyarrow", zero_copy_batch=True)
        out = partial_groupby(
            ds, ["l_returnflag", "l_linestatus"],
            {"sum_qty": ("l_quantity", "sum"),
             "sum_revenue": ("revenue", "sum"),
             "avg_disc": ("l_discount", "mean"),
             "n": (None, "count")},
        )
        return out.assign(
            sum_qty=out["sum_qty"].round(2).astype("float64"),
            sum_revenue=out["sum_revenue"].round(2),
            avg_disc=out["avg_disc"].round(6),
            n=out["n"].astype("int64"),
        )

    q(
        "lineitem_pricing_summary",
        lineitem_pricing_summary,
        """SELECT l_returnflag, l_linestatus,
                  round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue,
                  round(avg(l_discount), 6) AS avg_disc,
                  CAST(count(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1, 2""",
    )

    def events_by_type(sf_dir):
        ds = read_table(sf_dir, "events", columns=["event_type", "value"])
        out = partial_groupby(
            ds, ["event_type"],
            {"n": (None, "count"), "sum_value": ("value", "sum")},
        )
        return out.assign(
            n=out["n"].astype("int64"), sum_value=out["sum_value"].round(2)
        )

    q(
        "events_by_type",
        events_by_type,
        """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                  round(sum(value), 2) AS sum_value
           FROM events GROUP BY 1""",
    )

    def top_orders(sf_dir):
        ds = read_table(
            sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
        )
        return ds.sort(
            ["o_totalprice", "o_orderkey"], descending=[True, False]
        ).limit(10)

    q(
        "top_orders",
        top_orders,
        """SELECT o_orderkey, o_custkey, o_totalprice
           FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    )

    def revenue_by_nation(sf_dir):
        """Broadcast-small-side join (SURVEY §2.5): customer→nation dict is
        built driver-side, shipped once via ray.put, applied per batch.
        Guarded: customer scales with users, so past ~20M keys (≈300 MB of
        int64 pairs — no longer a sane broadcast) the plan switches to the
        bucketed large-large hash join (functions.joins)."""
        import ray

        n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
        if n_cust > 20_000_000:
            from ..functions.joins import bucketed_inner_join

            nat = pq.read_table(
                f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
            ).to_pandas()
            nat_map = nat.set_index("n_nationkey")["n_name"]
            cust_ds = read_table(
                sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
            ).map_batches(
                lambda df: pd.DataFrame(
                    {"o_custkey": df["c_custkey"],
                     "n_name": df["c_nationkey"].map(nat_map)}
                ),
                batch_format="pandas",
            )
            orders_ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
            joined = bucketed_inner_join(
                orders_ds, cust_ds, "o_custkey", ["o_totalprice"], ["n_name"],
                num_buckets=64,
            )
            out = partial_groupby(
                joined, ["n_name"],
                {"revenue": ("o_totalprice", "sum"), "n_orders": (None, "count")},
            )
            return out.assign(
                revenue=out["revenue"].round(2),
                n_orders=out["n_orders"].astype("int64"),
            )

        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ).to_pandas()
        nation = pq.read_table(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
        ).to_pandas()
        cust2name = cust.merge(
            nation, left_on="c_nationkey", right_on="n_nationkey"
        ).set_index("c_custkey")["n_name"]
        lookup_ref = ray.put(cust2name)

        class JoinNation:
            def __init__(self):
                self.lk = ray.get(lookup_ref)

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                df = df.copy()
                df["n_name"] = df["o_custkey"].map(self.lk)
                return df[["n_name", "o_totalprice"]]

        ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        joined = ds.map_batches(JoinNation, batch_format="pandas", concurrency=2)
        out = partial_groupby(
            joined, ["n_name"],
            {"revenue": ("o_totalprice", "sum"), "n_orders": (None, "count")},
        )
        return out.assign(
            revenue=out["revenue"].round(2), n_orders=out["n_orders"].astype("int64")
        )

    q(
        "revenue_by_nation",
        revenue_by_nation,
        """SELECT n.n_name, round(sum(o.o_totalprice), 2) AS revenue,
                  CAST(count(*) AS BIGINT) AS n_orders
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           GROUP BY 1""",
    )

    def user_first_event(sf_dir):
        """argmin-per-user at user cardinality: per-batch vectorized
        candidates + bucketed final pick — no per-user Python call
        (bucketed_first_by; the round-1 map_groups form paid one Python
        invocation per user)."""
        ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])
        return bucketed_first_by(
            ds, "user_id", ["ts", "event_id"],
            columns=["user_id", "event_id", "event_type"],
        )

    q(
        "user_first_event",
        user_first_event,
        """SELECT user_id, event_id, event_type FROM (
               SELECT user_id, event_id, event_type,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS rn
               FROM events) WHERE rn = 1""",
    )

    def segment_counts(sf_dir):
        ds = read_table(sf_dir, "customer", columns=["c_mktsegment", "c_acctbal"])
        out = partial_groupby(
            ds, ["c_mktsegment"],
            {"n": (None, "count"), "avg_bal": ("c_acctbal", "mean")},
        )
        return out.assign(
            n=out["n"].astype("int64"), avg_bal=out["avg_bal"].round(4)
        )

    q(
        "segment_counts",
        segment_counts,
        """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
                  round(avg(c_acctbal), 4) AS avg_bal
           FROM customer GROUP BY 1""",
    )

    # ---------------- training-data ops: documents ------------------------

    def docs_lang_stats(sf_dir):
        ds = read_table(sf_dir, "documents", columns=["lang", "n_chars"])
        out = partial_groupby(
            ds, ["lang"],
            {"n_docs": (None, "count"), "avg_chars": ("n_chars", "mean")},
        )
        return out.assign(
            n_docs=out["n_docs"].astype("int64"), avg_chars=out["avg_chars"].round(4)
        )

    q(
        "docs_lang_stats",
        docs_lang_stats,
        """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                  round(avg(n_chars), 4) AS avg_chars
           FROM documents GROUP BY 1""",
    )

    def docs_token_totals(sf_dir):
        ds = read_table(sf_dir, "documents", columns=["lang", "text"])
        ds = ds.map_batches(
            textstats.add_token_count, batch_format="pyarrow", zero_copy_batch=True
        )
        out = partial_groupby(
            ds, ["lang"], {"total_tokens": ("token_count", "sum")}
        )
        return out.assign(total_tokens=out["total_tokens"].astype("int64"))

    q(
        "docs_token_totals",
        docs_token_totals,
        """SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
           FROM documents GROUP BY 1""",
    )

    def docs_exact_dedup(sf_dir):
        """min(doc_id) per distinct text WITHOUT shuffling full text as the
        groupby key: md5 per batch, per-batch candidate pick, shuffle one
        (hash, min-id, its text) row per distinct hash per block, bucketed
        final pick (dedup.exact_dedup_by_hash shape, VERDICT r1 #4)."""
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
        hashed = ds.map_batches(
            dedup.add_hash_column, batch_format="pyarrow", zero_copy_batch=True
        )
        out = bucketed_first_by(
            hashed, "content_hash", ["doc_id"], columns=["doc_id", "text"]
        )
        return out.map_batches(
            lambda df: df.assign(doc_id=df["doc_id"].astype("int64")),
            batch_format="pandas",
        )

    q(
        "docs_exact_dedup",
        docs_exact_dedup,
        """SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, text
           FROM documents GROUP BY text""",
    )

    def docs_fingerprint(sf_dir):
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
        out = ds.map_batches(
            textstats.add_fingerprint, batch_format="pyarrow", zero_copy_batch=True
        )
        return out.select_columns(["doc_id", "fingerprint"])

    q(
        "docs_fingerprint",
        docs_fingerprint,
        "SELECT doc_id, md5(text) AS fingerprint FROM documents",
    )

    def docs_quality(sf_dir):
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
        scored = ds.map_batches(
            textstats.QualityScorer, batch_format="pandas", concurrency=2
        )
        return scored.map_batches(
            lambda df: df[["doc_id", "n_words", "quality_score"]],
            batch_format="pandas",
        )

    q("docs_quality", docs_quality)  # heuristic scoring — rows-only check

    def docs_langid(sf_dir):
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
        pred = ds.map_batches(textstats.LangId, batch_format="pandas", concurrency=2)
        return pred.map_batches(
            lambda df: df[["doc_id", "lang", "lang_pred"]], batch_format="pandas"
        )

    q("docs_langid", docs_langid)  # heuristic model — rows-only check

    def docs_minhash_pairs(sf_dir):
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
        out = dedup.minhash_candidate_pairs(ds, num_hashes=32, num_bands=8)
        return out.map_batches(
            lambda df: df.assign(
                id_a=df["id_a"].astype("int64"),
                id_b=df["id_b"].astype("int64"),
                n_bands=df["n_bands"].astype("int64"),
            ),
            batch_format="pandas",
        )

    q("docs_minhash_pairs", docs_minhash_pairs)  # LSH — rows-only check

    def docs_simhash(sf_dir):
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
        sigs = dedup.simhash_signatures(ds)
        return sigs.map_batches(
            lambda df: df.assign(
                doc_id=df["doc_id"].astype("int64"),
                simhash=df["simhash"].astype("uint64"),
            ),
            batch_format="pandas",
        )

    q("docs_simhash", docs_simhash)  # signatures — rows-only check

    # ---------------- windowed / sessionized / joined (SURVEY §2.10, §2.5) --

    def events_tumbling(sf_dir):
        """Tumbling 10-minute window aggregate — the engine's event-time
        window shape (guide: groupby window key; no watermark needed in
        batch)."""
        ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

        def add_window(t: pa.Table) -> pa.Table:
            us = t["ts"].cast(pa.int64())
            w = pc.divide(us, 600_000_000)  # 10-minute buckets
            return t.append_column("window", pc.cast(w, pa.int64()))

        ds = ds.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)
        out = partial_groupby(
            ds, ["window", "event_type"],
            {"n": (None, "count"), "sum_value": ("value", "sum")},
        )
        return out.assign(
            n=out["n"].astype("int64"), sum_value=out["sum_value"].round(2)
        )

    q(
        "events_tumbling",
        events_tumbling,
        """SELECT CAST(floor(epoch(ts) / 600) AS BIGINT) AS window, event_type,
                  CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
           FROM events GROUP BY 1, 2""",
    )

    def events_sessionized(sf_dir):
        """Gap-based sessionization (30-min inactivity) per user, with ONE
        vectorized kernel per coarse hash bucket instead of one Python call
        per user: sort (user, ts, event_id), break on user change OR gap,
        cumsum session ids, one C groupby per bucket (the reassemble
        pattern — stages/reassemble.py:28)."""
        from ..stages.aggregate import _key_bucket

        ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])

        def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(__bucket=_key_bucket(df, ["user_id"], 64))

        def sessionize_bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["user_id", "ts", "event_id"])
            new_user = df["user_id"].ne(df["user_id"].shift())
            brk = new_user | (df["ts"].diff() > pd.Timedelta(minutes=30))
            sid = brk.cumsum()
            out = (
                df.groupby(sid)
                .agg(user_id=("user_id", "first"), session_start=("ts", "min"),
                     n_events=("event_id", "size"))
                .reset_index(drop=True)
            )
            return out.assign(n_events=out["n_events"].astype("int64"))

        return ds.map_batches(add_bucket, batch_format="pandas").groupby(
            "__bucket"
        ).map_groups(
            lambda g: sessionize_bucket(g.drop(columns="__bucket")),
            batch_format="pandas",
        )

    q(
        "events_sessionized",
        events_sessionized,
        """WITH o AS (
               SELECT user_id, event_id, ts,
                      CASE WHEN lag(ts) OVER w IS NULL
                                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                           THEN 1 ELSE 0 END AS brk
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
           ), s AS (
               SELECT *, sum(brk) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS sid
               FROM o
           )
           SELECT user_id, min(ts) AS session_start,
                  CAST(count(*) AS BIGINT) AS n_events
           FROM s GROUP BY user_id, sid""",
    )

    def order_lineitem_join(sf_dir):
        """Bucketed large-large hash join (functions.joins) + aggregate:
        revenue per order priority."""
        from ..functions.joins import bucketed_inner_join

        li = read_table(
            sf_dir, "lineitem",
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        ).map_batches(
            lambda t: pa.table(
                {
                    "o_orderkey": t["l_orderkey"],
                    "revenue": pc.multiply(
                        t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])
                    ),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
        joined = bucketed_inner_join(
            li, orders, "o_orderkey", ["revenue"], ["o_orderpriority"],
            num_buckets=16,
        )
        out = partial_groupby(
            joined, ["o_orderpriority"],
            {"n_items": (None, "count"), "revenue": ("revenue", "sum")},
        )
        return out.assign(
            n_items=out["n_items"].astype("int64"), revenue=out["revenue"].round(2)
        )

    q(
        "order_lineitem_join",
        order_lineitem_join,
        """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
                  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           GROUP BY 1""",
    )

    def distinct_users_per_type(sf_dir):
        """COUNT(DISTINCT ...): distributed distinct of (type, user) pairs
        (bucketed — pair cardinality grows with users, so no driver
        materialization), then a tiny per-type count combine."""
        ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])
        pairs = bucketed_groupby(
            ds, ["event_type", "user_id"], {"n": (None, "count")}
        )
        out = partial_groupby(pairs, ["event_type"], {"n_users": (None, "count")})
        return out.assign(n_users=out["n_users"].astype("int64"))

    q(
        "distinct_users_per_type",
        distinct_users_per_type,
        """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
           FROM events GROUP BY 1""",
    )

    def t_session_sink_counts(sf_dir):
        """Session-epoch pipeline: sinks are {conv_id}.{session} (reference
        DataPumpDecoderSort.java:93-97; session epochs README.md:177-180)."""
        path = ensure_sessions_corpus(sf_dir)
        ds = read_transcripts(path)
        ds = add_sink_and_bucket(ds, num_buckets=16)
        ds = apply_parse(ds)
        ds = apply_reassemble(ds)
        routed = ds.map_batches(
            lambda t: t.filter(pc.equal(t["status"], "routed")).select(
                ["sink", "counter"]
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        return bucketed_groupby(
            routed, ["sink"],
            {"n_rows": (None, "count"), "max_counter": ("counter", "max")},
        )

    q(
        "t_session_sink_counts",
        t_session_sink_counts,
        f"""SELECT conv_id || '.' || CAST(session AS VARCHAR) AS sink,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(max(turn_idx) AS BIGINT) AS max_counter
            FROM read_parquet('{sessions_glob}') GROUP BY 1""",
    )

    # ---------------- similarity search: embeddings -----------------------

    def ann_topk(sf_dir):
        emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
        qvec = emb.filter(pc.equal(emb["vec_id"], 0))["embedding"][0].as_py()
        ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        out = ann.brute_force_topk(ds, qvec, k=10, exclude_id=0)
        return out.map_batches(
            lambda df: df.assign(
                vec_id=df["vec_id"].astype("int64"),
                cos_sim=df["cos_sim"].round(6),
            ),
            batch_format="pandas",
        )

    q(
        "ann_topk",
        ann_topk,
        """WITH qv AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0)
           SELECT vec_id,
                  round(CAST(list_cosine_similarity(embedding, qv.e) AS DOUBLE), 6) AS cos_sim
           FROM embeddings, qv WHERE vec_id <> 0
           ORDER BY list_cosine_similarity(embedding, qv.e) DESC, vec_id
           LIMIT 10""",
    )

    def ann_lsh_topk(sf_dir):
        emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
        qvec = emb.filter(pc.equal(emb["vec_id"], 0))["embedding"][0].as_py()
        ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        out = ann.lsh_topk(ds, qvec, k=10, nbits=6, multiprobe=1)
        return out.map_batches(
            lambda df: df.assign(
                vec_id=df["vec_id"].astype("int64"), cos_sim=df["cos_sim"].round(6)
            ),
            batch_format="pandas",
        )

    q("ann_lsh_topk", ann_lsh_topk)  # approximate — rows-only check

    def embedding_near_dups(sf_dir):
        ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
        out = ann.embedding_near_dup(ds, threshold=0.45, block_col="label")
        return out.map_batches(
            lambda df: df.assign(
                id_a=df["id_a"].astype("int64"), id_b=df["id_b"].astype("int64")
            ),
            batch_format="pandas",
        )

    q(
        "embedding_near_dups",
        embedding_near_dups,
        """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                  round(CAST(list_cosine_similarity(a.embedding, b.embedding)
                             AS DOUBLE), 6) AS cos_sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id < b.vec_id
           WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45""",
    )

    return queries, oracles
