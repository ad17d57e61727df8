"""Round-4 third-session operators vs DuckDB / pure-python oracles on
adversarial synthetic tables: ts ties on RANGE frame edges, single-
event users, unicode + tab/newline text (byte-vs-char class counting),
empty token lists, and multi-block inputs (tiny row groups force the
per-block partials to actually merge)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastparquet_ray.functions.analytics import new_users_weekly
from fastparquet_ray.functions.sampling import split_assign
from fastparquet_ray.functions.sketches import vocab_remap_stage
from fastparquet_ray.functions.textops import charclass_profile
from fastparquet_ray.functions.windows import rolling_minmax


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r4ops_sf")
    rng = np.random.default_rng(43)

    n_ev = 2500
    ts_base = pd.Timestamp("2024-05-01")
    # 60s grid => heavy ts ties, including on RANGE frame edges
    ts = ts_base + pd.to_timedelta(
        rng.integers(0, 3000, n_ev) * 60, unit="s"
    )
    events = pd.DataFrame(
        {
            "event_id": np.arange(n_ev, dtype=np.int64),
            "ts": ts.astype("datetime64[us]"),
            "user_id": np.concatenate(
                [
                    rng.integers(0, 30, n_ev - 3),
                    np.array([700, 701, 702]),  # single-event users
                ]
            ).astype(np.int64),
            "event_type": rng.choice(["view", "click", "error"], n_ev),
            "value": np.round(rng.normal(10, 5, n_ev), 4),
            "props": ["{}"] * n_ev,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(events), d / "events.parquet",
        row_group_size=200,
    )

    texts = [
        "plain ascii words 123",
        "tabs\tand\nnewlines\r\nhere 456",
        "unicode: héllo wörld — naïve café 789",  # multibyte bytes
        "ALLCAPS AND digits 0123456789",
        "",  # empty doc
        "    leading and trailing spaces    ",
    ]
    n_doc = 900
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n_doc, dtype=np.int64),
            "text": [texts[i % len(texts)] for i in range(n_doc)],
            "source": rng.choice(["web", "book", "code"], n_doc),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs), d / "documents.parquet",
        row_group_size=128,
    )
    return str(d)


def _duck(sf_dir):
    con = duckdb.connect()
    for t in ["events", "documents"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_rolling_minmax(ray_session, sf_dir):
    got = _norm(rolling_minmax(sf_dir).to_pandas())
    exp = _norm(
        _duck(sf_dir).execute(
            "SELECT event_id, user_id, "
            "max(value) OVER (PARTITION BY user_id ORDER BY ts RANGE "
            "BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW) "
            "AS max_win, "
            "min(value) OVER (PARTITION BY user_id ORDER BY ts RANGE "
            "BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW) "
            "AS min_win FROM events"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_new_users_weekly(ray_session, sf_dir):
    got = _norm(new_users_weekly(sf_dir))
    exp = _norm(
        _duck(sf_dir).execute(
            "WITH fs AS (SELECT user_id, min(epoch_us(ts)) AS mn "
            "FROM events GROUP BY user_id), "
            "wk AS (SELECT mn // 604800000000 AS week, count(*) AS n_new "
            "FROM fs GROUP BY week) "
            "SELECT CAST(week AS BIGINT) AS week, "
            "CAST(n_new AS BIGINT) AS n_new, "
            "CAST(sum(n_new) OVER (ORDER BY week) AS BIGINT) AS cum_users "
            "FROM wk ORDER BY week"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_split_assign(ray_session, sf_dir):
    got = _norm(split_assign(sf_dir))
    exp = _norm(
        _duck(sf_dir).execute(
            "SELECT source, CASE WHEN b < 90 THEN 'train' "
            "WHEN b < 95 THEN 'val' ELSE 'test' END AS split, "
            "CAST(count(*) AS BIGINT) AS n FROM ("
            "SELECT source, "
            "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))"
            "::UBIGINT % 100 AS b FROM documents) "
            "GROUP BY source, split"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # splits partition the corpus: totals must equal the row count
    assert got["n"].sum() == 900


def test_charclass_profile(ray_session, sf_dir):
    got = _norm(charclass_profile(sf_dir))
    exp = _norm(
        _duck(sf_dir).execute(
            "SELECT source, "
            "CAST(sum(length(regexp_replace(text, '[^A-Za-z]', '', 'g')))"
            " AS BIGINT) AS n_alpha, "
            "CAST(sum(length(regexp_replace(text, '[^0-9]', '', 'g')))"
            " AS BIGINT) AS n_digit, "
            "CAST(sum(length(regexp_replace(text, '[^ \\t\\n\\r]', '', 'g')))"
            " AS BIGINT) AS n_space "
            "FROM documents GROUP BY source"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_vocab_remap_stage(ray_session):
    import ray.data

    toks = [
        [5, 9, 5, 123, 7],
        [],  # empty list survives the rebuild
        [123, 123, 0],
        [2_000_000, 5],  # id outside keep range (searchsorted edge)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c", "d"]),
            "tokens": pa.array(toks, pa.list_(pa.int32())),
        }
    )
    keep = np.array([5, 123], dtype=np.int64)
    out = (
        vocab_remap_stage(ray.data.from_arrow(t), keep)
        .to_pandas()
        .set_index("doc_id")["tokens"]
    )
    exp = {
        "a": [5, -1, 5, 123, -1],
        "b": [],
        "c": [123, 123, -1],
        "d": [-1, 5],
    }
    for k, v in exp.items():
        assert list(out[k]) == v


def test_vocab_remap_stage_empty_keep(ray_session):
    import ray.data

    t = pa.table({"tokens": pa.array([[1, 2]], pa.list_(pa.int32()))})
    out = (
        vocab_remap_stage(
            ray.data.from_arrow(t), np.array([], dtype=np.int64)
        )
        .to_pandas()["tokens"]
        .iloc[0]
    )
    assert list(out) == [-1, -1]
