"""Windowed analytics / OLAP operators vs DuckDB + pandas oracles on
adversarial synthetic tables: ts ties, single-event users, constant
groups (mn == mx histogram degenerate), zero-order customers, and
multi-block inputs (small row groups force the per-block pre-prune and
per-block partials to actually merge)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastparquet_ray.functions.analytics import (
    cube_agg,
    grouped_quantiles,
    left_outer_join,
    pivot_counts,
    rollup_agg,
    stats_moments,
    window_lag,
    window_rank,
)


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    """Synthetic tables with the testdata schemas, written with tiny
    row groups so every operator sees multiple Ray blocks."""
    d = tmp_path_factory.mktemp("analytics_sf")
    rng = np.random.default_rng(11)

    n_ev = 3000
    ts_base = pd.Timestamp("2024-03-01")
    # deliberate ts ties: quantized to 90-second grid across 40 users
    ts = ts_base + pd.to_timedelta(
        rng.integers(0, 2000, n_ev) * 90, unit="s"
    )
    events = pd.DataFrame(
        {
            "event_id": np.arange(n_ev, dtype=np.int64),
            "ts": ts.astype("datetime64[us]"),
            "user_id": np.concatenate(
                [
                    rng.integers(0, 40, n_ev - 3),
                    np.array([900, 901, 902]),  # single-event users
                ]
            ).astype(np.int64),
            "event_type": rng.choice(["view", "click"], n_ev),
            "value": np.round(rng.normal(50, 20, n_ev), 4),
            "props": ["{}"] * n_ev,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(events), d / "events.parquet", row_group_size=256
    )

    n_li = 5000
    lineitem = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 1000, n_li).astype(np.int64),
            "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 90000, n_li), 2),
            "l_returnflag": rng.choice(["A", "N", "R"], n_li),
            "l_linestatus": rng.choice(["F", "O"], n_li),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(lineitem), d / "lineitem.parquet",
        row_group_size=512,
    )

    n_o = 2000
    price = np.round(rng.lognormal(10, 1, n_o), 2)
    prio = rng.choice(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], n_o
    )
    # one group constant-valued: the mn == mx degenerate histogram
    price[prio == "5-LOW"] = 1234.56
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_o, dtype=np.int64),
            # customers 150+ get no orders
            "o_custkey": rng.integers(0, 150, n_o).astype(np.int64),
            "o_totalprice": price,
            "o_orderpriority": prio,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(orders), d / "orders.parquet", row_group_size=256
    )

    customer = pd.DataFrame(
        {"c_custkey": np.arange(0, 180, dtype=np.int64)}  # 30 orderless
    )
    pq.write_table(pa.Table.from_pandas(customer), d / "customer.parquet")

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(600, dtype=np.int64),
            "source": rng.choice(["web", "book", "code"], 600),
            # 'zh' never occurs: pivot must still emit the n_zh column
            "lang": rng.choice(["de", "en", "es", "fr"], 600),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs), d / "documents.parquet", row_group_size=128
    )
    return str(d)


def _duck(sf_dir):
    con = duckdb.connect()
    for t in ["events", "lineitem", "orders", "customer", "documents"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_window_rank(ray_session, sf_dir):
    got = _norm(window_rank(sf_dir).to_pandas())
    exp = _norm(
        _duck(sf_dir).execute(
            "SELECT event_id, user_id, rn FROM (SELECT event_id, user_id, "
            "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, "
            "event_id DESC) AS rn FROM events) WHERE rn <= 3"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # single-event users appear exactly once with rn=1
    for uid in (900, 901, 902):
        assert got[got["user_id"] == uid]["rn"].tolist() == [1]


def test_window_lag(ray_session, sf_dir):
    got = _norm(window_lag(sf_dir).to_pandas())
    exp = _norm(
        _duck(sf_dir).execute(
            "SELECT event_id, user_id, ROUND(value - prev, 6) AS delta "
            "FROM (SELECT event_id, user_id, value, lag(value) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS prev "
            "FROM events) WHERE prev IS NOT NULL"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-6)
    assert not got["user_id"].isin([900, 901, 902]).any()


def test_rollup_agg(ray_session, sf_dir):
    got = _norm(rollup_agg(sf_dir))
    exp = _norm(
        _duck(sf_dir).execute(
            "SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n, "
            "ROUND(sum(l_quantity), 3) AS sum_qty FROM lineitem "
            "GROUP BY ROLLUP(l_returnflag, l_linestatus)"
        ).df()
    )
    assert len(got) == 3 * 2 + 3 + 1
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-6)


def test_cube_agg(ray_session, sf_dir):
    got = _norm(cube_agg(sf_dir))
    exp = _norm(
        _duck(sf_dir).execute(
            "SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n, "
            "ROUND(sum(l_quantity), 3) AS sum_qty FROM lineitem "
            "GROUP BY CUBE(l_returnflag, l_linestatus)"
        ).df()
    )
    assert len(got) == 3 * 2 + 3 + 2 + 1
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-6)


def test_token_docfreq_vs_duckdb(ray_session):
    """Document frequency over the flagship tokens corpus (sf0.001):
    Ray's per-row unique + bincount partials vs DuckDB's
    DISTINCT (doc, token) unnest count."""
    from fastparquet_ray.functions.sketches import token_docfreq
    from fastparquet_ray.pipelines.flagship import ensure_encoded

    sf_dir = "/root/testdata/sf0.001"
    paths, _ = ensure_encoded(sf_dir)
    got = token_docfreq(sf_dir, k=15)
    glob = paths[0].rsplit("/", 1)[0] + "/*.parquet"
    exp = duckdb.connect().execute(
        "SELECT CAST(tok AS BIGINT) AS tok, count(*) AS df FROM ("
        "SELECT DISTINCT doc_id, unnest(tokens) AS tok "
        f"FROM read_parquet('{glob}')) "
        "GROUP BY tok ORDER BY df DESC, tok LIMIT 15"
    ).df()
    assert got["tok"].tolist() == exp["tok"].tolist()
    assert got["df"].tolist() == exp["df"].tolist()


def test_tfidf_topk_vs_duckdb(ray_session):
    """TF-IDF per source over the flagship tokens corpus (sf0.001) vs
    the full SQL formulation (tf x ln(N/df), rounded-score ranking)."""
    from fastparquet_ray.functions.sketches import tfidf_topk
    from fastparquet_ray.pipelines.flagship import ensure_encoded

    sf_dir = "/root/testdata/sf0.001"
    paths, _ = ensure_encoded(sf_dir)
    got = tfidf_topk(sf_dir, top=3)
    glob = paths[0].rsplit("/", 1)[0] + "/*.parquet"
    exp = duckdb.connect().execute(
        f"WITH nn AS (SELECT count(*) AS nd FROM read_parquet('{glob}')), "
        "tf AS (SELECT source, tok, count(*) AS tf FROM ("
        f"SELECT source, unnest(tokens) AS tok FROM read_parquet('{glob}')"
        ") GROUP BY source, tok), "
        "dfq AS (SELECT tok, count(*) AS df FROM ("
        "SELECT DISTINCT doc_id, unnest(tokens) AS tok FROM "
        f"read_parquet('{glob}')) GROUP BY tok), "
        "s AS (SELECT tf.source, CAST(tf.tok AS BIGINT) AS tok, "
        "ROUND(tf.tf * ln((SELECT nd FROM nn) / dfq.df), 6) AS score "
        "FROM tf JOIN dfq ON tf.tok = dfq.tok), "
        "r AS (SELECT source, tok, score, row_number() OVER ("
        "PARTITION BY source ORDER BY score DESC, tok) AS rn FROM s) "
        "SELECT source, tok, score, rn FROM r WHERE rn <= 3 "
        "ORDER BY source, rn"
    ).df()
    got = got.sort_values(["source", "rn"]).reset_index(drop=True)
    assert got["source"].tolist() == exp["source"].tolist()
    assert got["tok"].tolist() == exp["tok"].tolist()
    assert got["rn"].tolist() == exp["rn"].tolist()
    np.testing.assert_allclose(got["score"], exp["score"], atol=1e-6)


def test_pivot_counts(ray_session, sf_dir):
    got = _norm(pivot_counts(sf_dir))
    assert "n_zh" in got.columns and (got["n_zh"] == 0).all()
    exp = _norm(
        _duck(sf_dir).execute(
            "SELECT source, "
            + ", ".join(
                "CAST(sum(CASE WHEN lang = '{0}' THEN 1 ELSE 0 END) AS BIGINT)"
                " AS n_{0}".format(lang)
                for lang in ["de", "en", "es", "fr", "zh"]
            )
            + " FROM documents GROUP BY source"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_stats_moments(ray_session, sf_dir):
    got = _norm(stats_moments(sf_dir))
    exp = _norm(
        _duck(sf_dir).execute(
            "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, "
            "ROUND(stddev_samp(l_extendedprice), 3) AS std_price, "
            "ROUND(corr(l_extendedprice, l_quantity), 6) AS corr_pq "
            "FROM lineitem GROUP BY l_returnflag"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-5)


def test_grouped_quantiles(ray_session, sf_dir):
    got = _norm(grouped_quantiles(sf_dir))
    exp = _norm(
        _duck(sf_dir).execute(
            "SELECT o_orderpriority, q, value FROM ("
            "SELECT o_orderpriority, CAST(0.5 AS DOUBLE) AS q, "
            "quantile_disc(o_totalprice, 0.5) AS value FROM orders "
            "GROUP BY o_orderpriority UNION ALL "
            "SELECT o_orderpriority, CAST(0.9 AS DOUBLE) AS q, "
            "quantile_disc(o_totalprice, 0.9) AS value FROM orders "
            "GROUP BY o_orderpriority)"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the constant group resolved through the mn == mx degenerate path
    low = got[got["o_orderpriority"] == "5-LOW"]
    assert (low["value"] == 1234.56).all()


def test_left_outer_join(ray_session, sf_dir):
    got = _norm(left_outer_join(sf_dir))
    exp = _norm(
        _duck(sf_dir).execute(
            "SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders, "
            "ROUND(COALESCE(sum(o_totalprice), 0), 3) AS total "
            "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
            "GROUP BY c_custkey"
        ).df()
    )
    assert len(got) == 180  # every customer kept
    orderless = got[got["c_custkey"] >= 150]
    assert (orderless["n_orders"] == 0).all()
    assert (orderless["total"] == 0.0).all()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-6)


def test_json_field_agg_missing_keys(ray_session, tmp_path):
    """Rows whose props lack the field contribute to neither count nor
    sum (NULL-skipping aggregate semantics)."""
    from fastparquet_ray.functions.relational import json_field_agg

    events = pd.DataFrame(
        {
            "event_type": ["a", "a", "a", "b", "b"],
            "props": ['{"k": 3}', '{"x": 9}', '{"k": 5}', "{}", '{"k": 7}'],
        }
    )
    pq.write_table(pa.Table.from_pandas(events), tmp_path / "events.parquet")
    got = (
        json_field_agg(str(tmp_path))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert got["event_type"].tolist() == ["a", "b"]
    assert got["n"].tolist() == [2, 1]
    assert got["sum_k"].tolist() == [8, 7]
    assert got["max_k"].tolist() == [5, 7]


def test_set_ops_and_mode(ray_session, sf_dir):
    """INTERSECT / EXCEPT / mode over the synthetic orders/lineitem
    fixture vs DuckDB (orders here have statuses via o_orderpriority?
    no — construct from lineitem/orders fixture columns)."""
    from fastparquet_ray.functions.relational import (
        except_keys,
        intersect_keys,
        mode_per_group,
        union_distinct,
    )

    con = _duck(sf_dir)
    # the fixture's orders table has no o_orderstatus; build one
    import pyarrow as pa
    import pyarrow.parquet as pq
    import numpy as np

    rng = np.random.default_rng(23)
    orders = con.execute("SELECT * FROM orders").df()
    orders["o_orderstatus"] = rng.choice(["F", "O", "P"], len(orders))
    pq.write_table(
        pa.Table.from_pandas(orders), f"{sf_dir}/orders.parquet",
        row_group_size=256,
    )
    con = _duck(sf_dir)

    got = _norm(intersect_keys(sf_dir))
    exp = _norm(
        con.execute(
            "SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus='F' "
            "INTERSECT SELECT DISTINCT o_custkey FROM orders "
            "WHERE o_orderstatus='O'"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    got = _norm(except_keys(sf_dir))
    exp = _norm(
        con.execute(
            "SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus='F' "
            "EXCEPT SELECT DISTINCT o_custkey FROM orders "
            "WHERE o_orderstatus='O'"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    got = _norm(union_distinct(sf_dir).to_pandas())
    exp = _norm(
        con.execute(
            "SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity > 45 "
            "UNION SELECT l_orderkey, l_quantity FROM lineitem "
            "WHERE l_quantity < 5"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    got = _norm(mode_per_group(sf_dir))
    exp = _norm(
        con.execute(
            "SELECT l_returnflag, mode_qty, n FROM ("
            "SELECT l_returnflag, l_quantity AS mode_qty, "
            "CAST(count(*) AS BIGINT) AS n, row_number() OVER ("
            "PARTITION BY l_returnflag ORDER BY count(*) DESC, l_quantity"
            ") AS rn FROM lineitem GROUP BY l_returnflag, l_quantity"
            ") WHERE rn = 1"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_rolling_avg_range_ties(ray_session, sf_dir):
    """RANGE-frame semantics under ts ties: equal-ts rows of a user
    must all see the same window (including tied rows positioned
    after themselves in any ordering)."""
    from fastparquet_ray.functions.windows import rolling_avg

    got = _norm(rolling_avg(sf_dir).to_pandas())
    exp = _norm(
        _duck(sf_dir).execute(
            "SELECT event_id, user_id, "
            "ROUND(avg(value) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW), 6)"
            " AS avg_win FROM events"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_regression_by_group(ray_session, sf_dir):
    from fastparquet_ray.functions.analytics import regression_by_group

    got = _norm(regression_by_group(sf_dir))
    exp = _norm(
        _duck(sf_dir).execute(
            "SELECT l_returnflag, "
            "ROUND(regr_slope(l_quantity, l_extendedprice), 6) AS slope, "
            "ROUND(regr_intercept(l_quantity, l_extendedprice), 6) "
            "AS intercept, "
            "ROUND(covar_pop(l_extendedprice, l_quantity), 6) AS covar_pq "
            "FROM lineitem GROUP BY l_returnflag"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_langs_per_source(ray_session, sf_dir):
    from fastparquet_ray.functions.relational import langs_per_source

    got = _norm(langs_per_source(sf_dir))
    exp = _norm(
        _duck(sf_dir).execute(
            "SELECT source, string_agg(DISTINCT lang, ',' ORDER BY lang) "
            "AS langs FROM documents GROUP BY source"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_running_sum(ray_session, sf_dir):
    """Per-user cumulative sum vs DuckDB's running-window SUM on the
    tie-heavy events fixture."""
    from fastparquet_ray.functions.analytics import running_sum

    got = _norm(running_sum(sf_dir).to_pandas())
    exp = _norm(
        _duck(sf_dir).execute(
            "SELECT event_id, user_id, ROUND(sum(value) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) "
            "AS run_sum FROM events"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_histogram_vs_duckdb(ray_session):
    """Fixed-width int-arithmetic bins over the real documents table
    (sf0.001) vs the identical SQL formulation."""
    from fastparquet_ray.functions.analytics import histogram

    sf = "/root/testdata/sf0.001"
    got = _norm(histogram(sf, bins=20))
    exp = _norm(
        duckdb.connect().execute(
            "WITH mm AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi "
            f"FROM read_parquet('{sf}/documents.parquet')) "
            "SELECT (n_chars - lo) * 20 // (hi - lo + 1) AS bin, "
            "count(*) AS n "
            f"FROM read_parquet('{sf}/documents.parquet'), mm GROUP BY bin"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got["n"].sum() == 500  # every row binned exactly once


def test_entropy_by_source_vs_duckdb(ray_session):
    """Shannon entropy per source over the flagship tokens corpus
    (sf0.001) vs DuckDB's entropy() (log2) aggregate."""
    from fastparquet_ray.functions.sketches import entropy_by_source
    from fastparquet_ray.pipelines.flagship import ensure_encoded

    sf_dir = "/root/testdata/sf0.001"
    paths, _ = ensure_encoded(sf_dir)
    got = entropy_by_source(sf_dir)
    glob = paths[0].rsplit("/", 1)[0] + "/*.parquet"
    exp = duckdb.connect().execute(
        "SELECT source, ROUND(entropy(tok), 6) AS ent FROM ("
        f"SELECT source, unnest(tokens) AS tok FROM read_parquet('{glob}')"
        ") GROUP BY source ORDER BY source"
    ).df()
    assert got["source"].tolist() == exp["source"].tolist()
    np.testing.assert_allclose(got["ent"], exp["ent"], atol=2e-6)


def test_ntile_vs_duckdb(ray_session, sf_dir):
    """Equal-frequency NTILE buckets vs DuckDB, on a column with a
    heavy constant group (all '5-LOW' orders share one price), so
    boundary VALUES are tied across many rows and the residue-row rank
    split must fire. k=7 exercises uneven bucket sizes (n % k != 0)."""
    from fastparquet_ray.functions.analytics import ntile

    for k in (10, 7):
        got = _norm(ntile(sf_dir, k=k))
        exp = _norm(
            _duck(sf_dir).execute(
                "SELECT bucket, count(*) AS n, "
                "ROUND(avg(o_totalprice), 6) AS avg_price FROM ("
                f"SELECT o_totalprice, CAST(NTILE({k}) OVER ("
                "ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS bucket "
                "FROM orders) GROUP BY bucket"
            ).df()
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_funnel_conversion_vs_duckdb(ray_session, sf_dir):
    """view->click conversion count vs the SQL half-open range join on
    the tie-heavy events fixture; 1-day salt forces border ghosts."""
    from fastparquet_ray.functions.windows import funnel_conversion

    got = funnel_conversion(sf_dir, window_minutes=30)
    exp = _duck(sf_dir).execute(
        "SELECT count(DISTINCT c.user_id) AS converted_users "
        "FROM events c JOIN events v ON v.user_id = c.user_id "
        "AND v.event_type = 'view' AND c.event_type = 'click' "
        "AND v.ts < c.ts AND v.ts >= c.ts - INTERVAL 30 MINUTE"
    ).df()
    assert int(got["converted_users"].iloc[0]) == int(
        exp["converted_users"].iloc[0]
    )


def test_inverted_index_vs_duckdb(ray_session):
    """Rarest-token posting lists over the flagship tokens corpus
    (sf0.001) vs DISTINCT string_agg in SQL."""
    from fastparquet_ray.functions.sketches import inverted_index
    from fastparquet_ray.pipelines.flagship import ensure_encoded

    sf_dir = "/root/testdata/sf0.001"
    paths, _ = ensure_encoded(sf_dir)
    got = inverted_index(sf_dir, k=10)
    glob = paths[0].rsplit("/", 1)[0] + "/*.parquet"
    exp = duckdb.connect().execute(
        "WITH dfq AS (SELECT tok, count(*) AS df FROM ("
        "SELECT DISTINCT doc_id, unnest(tokens) AS tok FROM "
        f"read_parquet('{glob}')) GROUP BY tok), "
        "pick AS (SELECT tok FROM dfq WHERE df >= 2 "
        "ORDER BY df, tok LIMIT 10) "
        "SELECT CAST(t.tok AS BIGINT) AS tok, "
        "string_agg(DISTINCT t.doc_id, ',' ORDER BY t.doc_id) AS postings "
        "FROM (SELECT doc_id, unnest(tokens) AS tok FROM "
        f"read_parquet('{glob}')) t JOIN pick USING (tok) "
        "GROUP BY t.tok ORDER BY tok"
    ).df()
    assert got["tok"].tolist() == exp["tok"].tolist()
    assert got["postings"].tolist() == exp["postings"].tolist()


def test_zscore_outliers_vs_duckdb(ray_session, sf_dir):
    """Per-user z-score outliers vs the SQL formulation; single-event
    users (sd undefined) and any zero-variance users must drop."""
    from fastparquet_ray.functions.analytics import zscore_outliers

    got = _norm(zscore_outliers(sf_dir).to_pandas())
    exp = _norm(
        _duck(sf_dir).execute(
            "WITH st AS (SELECT user_id, avg(value) AS m, "
            "stddev_samp(value) AS sd, count(*) AS c FROM events "
            "GROUP BY user_id) "
            "SELECT e.event_id, e.user_id, "
            "ROUND((e.value - st.m) / st.sd, 6) AS z "
            "FROM events e JOIN st USING (user_id) "
            "WHERE st.c >= 2 AND st.sd > 0 "
            "AND abs((e.value - st.m) / st.sd) > 2"
        ).df()
    )
    assert len(got) > 0
    assert got["event_id"].tolist() == exp["event_id"].tolist()
    np.testing.assert_allclose(got["z"], exp["z"], atol=2e-6)


def test_normalized_dedup_vs_duckdb(ray_session, tmp_path):
    """Normalized dedup on an adversarial corpus: case variants,
    tab/newline/multi-space reformatting, and leading/trailing
    whitespace must all collapse; distinct texts must not."""
    from fastparquet_ray.functions.textops import normalized_dedup

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "text": [
                "Hello  World",
                "hello world",          # dup of 0 after norm
                "\tHello\nWorld ",      # dup of 0 after norm
                "HELLO WORLD!",         # distinct (punctuation)
                "other text",
                "other\ttext",          # dup of 4
                "unique a",
                "unique b",
            ],
            "lang": ["en"] * 8,
            "source": ["s1"] * 6 + ["s2"] * 2,
            "n_chars": np.int64(10),
        }
    )
    d = tmp_path / "nd"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(docs), d / "documents.parquet",
        row_group_size=3,
    )
    got = normalized_dedup(str(d))
    assert got.values.tolist() == [["s1", 6, 3], ["s2", 2, 2]]
    exp = duckdb.connect().execute(
        "SELECT source, count(*) AS n, count(DISTINCT "
        "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS n_norm "
        f"FROM read_parquet('{d}/documents.parquet') "
        "GROUP BY source ORDER BY source"
    ).df()
    pd.testing.assert_frame_equal(
        got, exp, check_dtype=False
    )


def test_bigram_pmi_vs_duckdb(ray_session):
    """Bigram PMI collocations over the flagship tokens corpus
    (sf0.001) vs the full SQL formulation (list_zip bigrams)."""
    from fastparquet_ray.functions.sketches import bigram_pmi
    from fastparquet_ray.pipelines.flagship import ensure_encoded

    sf_dir = "/root/testdata/sf0.001"
    paths, _ = ensure_encoded(sf_dir)
    got = bigram_pmi(sf_dir, min_count=5, top=15)
    glob = paths[0].rsplit("/", 1)[0] + "/*.parquet"
    exp = duckdb.connect().execute(
        "WITH uni AS (SELECT CAST(tok AS BIGINT) AS a, count(*) AS c "
        f"FROM (SELECT unnest(tokens) AS tok FROM read_parquet('{glob}')) "
        "GROUP BY a), "
        "nu AS (SELECT sum(c)::DOUBLE AS v FROM uni), "
        "bi AS (SELECT CAST(p[1] AS BIGINT) AS a, CAST(p[2] AS BIGINT) "
        "AS b, count(*) AS n FROM (SELECT unnest(list_zip(tokens, "
        f"tokens[2:])) AS p FROM read_parquet('{glob}') "
        "WHERE len(tokens) >= 2) WHERE p[2] IS NOT NULL GROUP BY a, b), "
        "nb AS (SELECT sum(n)::DOUBLE AS v FROM bi), "
        "s AS (SELECT bi.a, bi.b, bi.n, "
        "ROUND(ln((bi.n / (SELECT v FROM nb)) / ((ua.c / "
        "(SELECT v FROM nu)) * (ub.c / (SELECT v FROM nu)))), 6) AS pmi "
        "FROM bi JOIN uni ua ON ua.a = bi.a JOIN uni ub ON ub.a = bi.b "
        "WHERE bi.n >= 5) "
        "SELECT a, b, n, pmi FROM s ORDER BY pmi DESC, a, b LIMIT 15"
    ).df()
    assert got["a"].tolist() == exp["a"].tolist()
    assert got["b"].tolist() == exp["b"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    np.testing.assert_allclose(got["pmi"], exp["pmi"], atol=2e-6)


def test_mad_value_vs_duckdb(ray_session, sf_dir):
    """Chained rank-selection MAD vs DuckDB mad()/median() on the
    synthetic events (even row count exercises the interpolated
    median on BOTH passes)."""
    from fastparquet_ray.functions.sketches import mad_value

    got = mad_value(sf_dir)
    exp = _duck(sf_dir).execute(
        "SELECT ROUND(median(value), 6) AS med, "
        "ROUND(mad(value), 6) AS mad FROM events"
    ).df()
    np.testing.assert_allclose(got["med"], exp["med"], atol=2e-6)
    np.testing.assert_allclose(got["mad"], exp["mad"], atol=2e-6)


def test_mad_value_constant_column(ray_session, tmp_path):
    """Degenerate mn == mx column: both rank-selection passes hit the
    constant-bucket shortcut; MAD must be exactly 0."""
    from fastparquet_ray.functions.sketches import mad_value

    df = pd.DataFrame(
        {"event_id": np.arange(7, dtype=np.int64),
         "value": np.full(7, 3.25)}
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    got = mad_value(str(tmp_path))
    assert got["med"].iloc[0] == 3.25
    assert got["mad"].iloc[0] == 0.0


def test_cohort_retention_vs_duckdb(ray_session, sf_dir):
    """Week-over-week retention vs the DuckDB self-join; the fixture's
    single-event users (900-902) pin the never-retained edge and the
    40 quantized-ts users span week boundaries."""
    from fastparquet_ray.functions.analytics import cohort_retention

    got = _norm(cohort_retention(sf_dir))
    exp = _norm(
        _duck(sf_dir).execute(
            "WITH uw AS (SELECT DISTINCT user_id, "
            "CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk FROM events) "
            "SELECT a.wk AS wk, count(*) AS active, "
            "count(b.user_id) AS retained, "
            "ROUND(count(b.user_id) * 1.0 / count(*), 6) AS rate "
            "FROM uw a LEFT JOIN uw b ON b.user_id = a.user_id "
            "AND b.wk = a.wk + 1 GROUP BY a.wk ORDER BY wk"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # last week can never retain into a week with no data
    last = got.sort_values("wk").iloc[-1]
    assert last["retained"] <= last["active"]


def test_source_vocab_jaccard_vs_duckdb(ray_session):
    """Pairwise vocabulary Jaccard over the flagship tokens corpus vs
    the DuckDB distinct-unnest self-join."""
    from fastparquet_ray.functions.sketches import source_vocab_jaccard
    from fastparquet_ray.pipelines.flagship import ensure_encoded

    sf_dir = "/root/testdata/sf0.001"
    paths, _ = ensure_encoded(sf_dir)
    got = source_vocab_jaccard(sf_dir)
    glob = paths[0].rsplit("/", 1)[0] + "/*.parquet"
    exp = duckdb.connect().execute(
        "WITH st AS (SELECT DISTINCT source, unnest(tokens) AS tok "
        f"FROM read_parquet('{glob}')), "
        "c AS (SELECT source, count(*) AS n FROM st GROUP BY source) "
        "SELECT a.source AS src_a, b.source AS src_b, "
        "ROUND(count(*) * 1.0 / (ca.n + cb.n - count(*)), 6) AS jaccard "
        "FROM st a JOIN st b ON b.tok = a.tok AND a.source < b.source "
        "JOIN c ca ON ca.source = a.source "
        "JOIN c cb ON cb.source = b.source "
        "GROUP BY a.source, b.source, ca.n, cb.n ORDER BY src_a, src_b"
    ).df()
    assert got["src_a"].tolist() == exp["src_a"].tolist()
    assert got["src_b"].tolist() == exp["src_b"].tolist()
    np.testing.assert_allclose(got["jaccard"], exp["jaccard"], atol=2e-6)
    # jaccard is a [0, 1] similarity
    assert ((got["jaccard"] >= 0) & (got["jaccard"] <= 1)).all()


def test_window_lag_running_sum_many_blocks(ray_session, tmp_path):
    """Segmented-sort window execution: force MANY tiny sorted blocks
    so (user, bkt) groups straddle block boundaries, and check the
    border-fix path against a pandas reference (hot user spanning
    buckets, negative values, interleaved users)."""
    import pyarrow.parquet as pq
    import ray.data
    from ray.data import DataContext

    from fastparquet_ray.functions.analytics import running_sum, window_lag

    rng = np.random.default_rng(5)
    n = 4000
    # one very hot user + a spread, timestamps across 10 weeks
    users = np.where(
        rng.random(n) < 0.5, 7, rng.integers(0, 40, n)
    ).astype(np.int64)
    ts = pd.Timestamp("2024-01-01").value // 1000 + np.sort(
        rng.integers(0, 70 * 86_400_000_000, n)
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": users,
            "event_type": "view",
            "ts": pd.to_datetime(ts, unit="us"),
            "value": np.round(rng.normal(0, 10, n), 3),  # negatives too
            "props": "{}",
        }
    )
    d = tmp_path / "evmany"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(df), d / "events.parquet", row_group_size=256
    )

    ctx = DataContext.get_current()
    old_target = ctx.target_max_block_size
    ctx.target_max_block_size = 16 * 1024  # tiny blocks -> straddles
    try:
        lag = window_lag(str(d)).to_pandas()
        run = running_sum(str(d)).to_pandas()
    finally:
        ctx.target_max_block_size = old_target

    # pandas reference (unsalted: plain per-user order by ts, event_id)
    ref = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    g = ref.groupby("user_id")
    ref_lag = ref.assign(delta=np.round(g["value"].diff(), 6)).dropna(
        subset=["delta"]
    )
    ref_run = ref.assign(run_sum=np.round(g["value"].cumsum(), 6))

    got_lag = lag.sort_values("event_id").reset_index(drop=True)
    want_lag = ref_lag[["event_id", "user_id", "delta"]].sort_values(
        "event_id"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_lag[["event_id", "user_id", "delta"]], want_lag,
        check_dtype=False, atol=1e-6,
    )
    got_run = run.sort_values("event_id").reset_index(drop=True)
    want_run = ref_run[["event_id", "user_id", "run_sum"]].sort_values(
        "event_id"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_run[["event_id", "user_id", "run_sum"]], want_run,
        check_dtype=False, atol=1e-6,
    )


def test_repetition_ratio_hand_case(ray_session, tmp_path):
    """Gopher top-bigram fraction on hand-built docs: 'a b a b a b'
    has bigrams [ab, ba, ab, ba, ab] -> top 3/5 = 0.6; a no-repeat doc
    scores 1/n_bigrams; single-word docs are excluded."""
    import pyarrow.parquet as pq

    from fastparquet_ray.functions.textops import repetition_ratio

    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "a b a b a b",          # ratio 0.6 -> repetitive
                "w x y z q r",          # ratio 0.2 -> (5 distinct bigrams)
                "solo",                  # no bigrams: excluded
                "m m m m",              # ratio 1.0 -> repetitive
            ],
            "lang": "en",
            "source": ["s1", "s1", "s1", "s2"],
            "n_chars": [11, 11, 4, 7],
        }
    )
    d = tmp_path / "docs_rep"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df), d / "documents.parquet")
    out = repetition_ratio(str(d), threshold=0.5)
    out = out.set_index("source")
    assert int(out.loc["s1", "n_docs"]) == 2
    assert int(out.loc["s1", "n_repetitive"]) == 1
    assert abs(float(out.loc["s1", "mean_ratio"]) - 0.4) < 1e-9
    assert int(out.loc["s2", "n_docs"]) == 1
    assert int(out.loc["s2", "n_repetitive"]) == 1
    assert abs(float(out.loc["s2", "mean_ratio"]) - 1.0) < 1e-9


def test_window_rank_many_blocks(ray_session, tmp_path):
    """window_rank's border-healed rank pass: force MANY tiny sorted
    blocks so a hot user's pruned top-k rows straddle block borders,
    and check ranks against DuckDB's row_number."""
    import duckdb
    import pyarrow.parquet as pq
    from ray.data import DataContext

    from fastparquet_ray.functions.analytics import window_rank

    rng = np.random.default_rng(31)
    n = 4000
    users = np.where(
        rng.random(n) < 0.5, 3, rng.integers(0, 50, n)
    ).astype(np.int64)
    ts = pd.Timestamp("2024-01-01").value // 1000 + np.sort(
        rng.choice(90 * 86_400_000_000, n, replace=False)
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": users,
            "event_type": "view",
            "ts": pd.to_datetime(ts, unit="us"),
            "value": 0.0,
            "props": "{}",
        }
    )
    d = tmp_path / "wr"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(df), d / "events.parquet", row_group_size=256
    )

    ctx = DataContext.get_current()
    old_target = ctx.target_max_block_size
    ctx.target_max_block_size = 4 * 1024  # tiny blocks -> straddles
    try:
        got = (
            window_rank(str(d))
            .to_pandas()
            .sort_values(["user_id", "rn"])
            .reset_index(drop=True)
        )
    finally:
        ctx.target_max_block_size = old_target

    want = duckdb.connect().execute(
        f"""
        SELECT event_id, user_id, rn FROM (
          SELECT event_id, user_id,
            row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
          FROM read_parquet('{d}/events.parquet'))
        WHERE rn <= 3 ORDER BY user_id, rn
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_lead_value(ray_session, sf_dir):
    from fastparquet_ray.functions.analytics import lead_value

    got = _norm(lead_value(sf_dir).to_pandas())
    exp = _norm(
        _duck(sf_dir).execute(
            "SELECT event_id, user_id, next_value "
            "FROM (SELECT event_id, user_id, lead(value) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS next_value "
            "FROM events) WHERE next_value IS NOT NULL"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-9)
    # single-event users have no successor
    assert not got["user_id"].isin([900, 901, 902]).any()


def test_lead_value_tiny_blocks(ray_session, sf_dir):
    """Force many tiny sorted blocks so users straddle block borders:
    the border-frame successor fix must restore every missing lead."""
    import ray.data

    from fastparquet_ray.functions.analytics import lead_value

    ctx = ray.data.DataContext.get_current()
    old_target = ctx.target_max_block_size
    ctx.target_max_block_size = 16 * 1024
    try:
        got = _norm(lead_value(sf_dir).to_pandas())
    finally:
        ctx.target_max_block_size = old_target
    exp = _norm(
        _duck(sf_dir).execute(
            "SELECT event_id, user_id, lead(value) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS next_value "
            "FROM events QUALIFY next_value IS NOT NULL"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-9)


def test_nucleus_coverage_vs_duckdb(ray_session):
    from fastparquet_ray.functions.sketches import nucleus_coverage
    from fastparquet_ray.pipelines.flagship import ensure_encoded

    sf_dir = "/root/testdata/sf0.001"
    paths, _ = ensure_encoded(sf_dir)
    got = nucleus_coverage(sf_dir)
    glob = paths[0].rsplit("/", 1)[0] + "/*.parquet"
    exp = duckdb.connect().execute(
        "WITH tf AS (SELECT source, tok, count(*) AS n FROM ("
        f"SELECT source, unnest(tokens) AS tok FROM read_parquet('{glob}')"
        ") GROUP BY source, tok), "
        "tot AS (SELECT source, sum(n) AS total FROM tf GROUP BY source), "
        "c AS (SELECT tf.source AS source, n, sum(n) OVER ("
        "PARTITION BY tf.source ORDER BY n DESC, tok) AS cum, total "
        "FROM tf JOIN tot ON tf.source = tot.source) "
        "SELECT source, CAST(count(*) AS BIGINT) AS n_tokens "
        "FROM c WHERE cum - n < 0.9 * total GROUP BY source "
        "ORDER BY source"
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got["n_tokens"] > 0).all()


def test_zipf_slope_vs_duckdb(ray_session):
    from fastparquet_ray.functions.sketches import zipf_slope
    from fastparquet_ray.pipelines.flagship import ensure_encoded

    sf_dir = "/root/testdata/sf0.001"
    paths, _ = ensure_encoded(sf_dir)
    got = zipf_slope(sf_dir)
    glob = paths[0].rsplit("/", 1)[0] + "/*.parquet"
    exp = duckdb.connect().execute(
        "WITH tf AS (SELECT source, tok, count(*) AS n FROM ("
        f"SELECT source, unnest(tokens) AS tok FROM read_parquet('{glob}')"
        ") GROUP BY source, tok), "
        "r AS (SELECT source, n, row_number() OVER ("
        "PARTITION BY source ORDER BY n DESC, tok) AS rank FROM tf) "
        "SELECT source, ROUND(regr_slope(ln(n), ln(rank)), 6) AS slope "
        "FROM r GROUP BY source ORDER BY source"
    ).df()
    assert got["source"].tolist() == exp["source"].tolist()
    np.testing.assert_allclose(got["slope"], exp["slope"], atol=2e-6)
    # a token-frequency table should be Zipf-ish: negative slope
    assert (got["slope"] < 0).all()


def test_kl_divergence_vs_duckdb(ray_session):
    from fastparquet_ray.functions.sketches import kl_divergence
    from fastparquet_ray.pipelines.flagship import ensure_encoded

    sf_dir = "/root/testdata/sf0.001"
    paths, _ = ensure_encoded(sf_dir)
    got = kl_divergence(sf_dir)
    glob = paths[0].rsplit("/", 1)[0] + "/*.parquet"
    exp = duckdb.connect().execute(
        "WITH tf AS (SELECT source, tok, count(*) AS n FROM ("
        f"SELECT source, unnest(tokens) AS tok FROM read_parquet('{glob}')"
        ") GROUP BY source, tok), "
        "tot AS (SELECT source, sum(n) AS total FROM tf GROUP BY source), "
        "g AS (SELECT tok, sum(n) AS gn FROM tf GROUP BY tok), "
        "gt AS (SELECT sum(n) AS grand FROM tf) "
        "SELECT tf.source AS source, ROUND(SUM((n / total) * "
        "ln((n / total) / (gn / grand))), 6) AS kl "
        "FROM tf JOIN tot ON tf.source = tot.source "
        "JOIN g ON tf.tok = g.tok CROSS JOIN gt "
        "GROUP BY tf.source ORDER BY source"
    ).df()
    assert got["source"].tolist() == exp["source"].tolist()
    np.testing.assert_allclose(got["kl"], exp["kl"], atol=2e-6)
    # KL is non-negative and strictly positive for a non-uniform mix
    assert (got["kl"] >= 0).all() and got["kl"].max() > 0


def test_percent_rank(ray_session, sf_dir):
    from fastparquet_ray.functions.analytics import percent_rank_value

    got = _norm(percent_rank_value(sf_dir).to_pandas())
    exp = _norm(
        _duck(sf_dir).execute(
            "SELECT event_id, user_id, ROUND(percent_rank() OVER ("
            "PARTITION BY user_id ORDER BY value, event_id), 6) AS pr "
            "FROM events"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-6)
    # single-event users rank 0.0 (SQL semantics), present in output
    single = got[got["user_id"] == 900]
    assert len(single) == 1 and single["pr"].iloc[0] == 0.0


def test_percent_rank_tiny_blocks(ray_session, sf_dir):
    """Many tiny sorted blocks: straddler rank offsets AND straddler
    total counts must both come from the border frame."""
    import ray.data

    from fastparquet_ray.functions.analytics import percent_rank_value

    ctx = ray.data.DataContext.get_current()
    old_target = ctx.target_max_block_size
    ctx.target_max_block_size = 16 * 1024
    try:
        got = _norm(percent_rank_value(sf_dir).to_pandas())
    finally:
        ctx.target_max_block_size = old_target
    exp = _norm(
        _duck(sf_dir).execute(
            "SELECT event_id, user_id, ROUND(percent_rank() OVER ("
            "PARTITION BY user_id ORDER BY value, event_id), 6) AS pr "
            "FROM events"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-6)
