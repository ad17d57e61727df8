"""Round-4 fourth-session operators vs DuckDB oracles on adversarial
synthetic tables: NaN values and constant / single-row groups for the
winsorized mean, perfectly-correlated and zero-variance columns for
the correlation matrix, multi-block deterministic shuffle, and the
vocab-profile consumers (frequency-of-frequency, rare-token docs)
against UNNEST SQL over the generated tokens corpus."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastparquet_ray.functions.analytics import corr_matrix, winsorized_mean
from fastparquet_ray.functions.sampling import shuffle_head
from fastparquet_ray.functions.sketches import rare_token_docs, token_ffreq


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r4d_sf")
    rng = np.random.default_rng(47)

    n_ev = 3000
    value = np.round(rng.normal(50, 20, n_ev), 4)
    value[rng.integers(0, n_ev, 40)] = np.nan  # NULLs ignored by avg
    event_type = rng.choice(["view", "click", "error"], n_ev).astype(object)
    # degenerate groups: constant-value (p05 == p95) and single-row
    event_type[:15] = "const"
    value[:15] = 7.5
    event_type[15] = "solo"
    value[15] = 123.456
    events = pd.DataFrame(
        {
            "event_id": np.arange(n_ev, dtype=np.int64),
            "ts": pd.Timestamp("2024-05-01")
            + pd.to_timedelta(np.arange(n_ev) * 60, unit="s"),
            "user_id": rng.integers(0, 50, n_ev).astype(np.int64),
            "event_type": event_type,
            "value": value,
            "props": ["{}"] * n_ev,
        }
    )
    events["ts"] = events["ts"].astype("datetime64[us]")
    pq.write_table(
        pa.Table.from_pandas(events), d / "events.parquet",
        row_group_size=256,
    )

    n_li = 2000
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    lineitem = pd.DataFrame(
        {
            "l_quantity": qty,
            "l_extendedprice": qty * 101.5 + 3.0,  # corr == 1 exactly
            "l_discount": np.round(rng.uniform(0, 0.1, n_li), 4),
            "l_tax": np.full(n_li, 0.04),  # zero variance -> NULL corr
        }
    )
    pq.write_table(
        pa.Table.from_pandas(lineitem), d / "lineitem.parquet",
        row_group_size=256,
    )

    n_doc = 1200
    # word counts heavily tied around the p90 boundary (values 1..10)
    wc = rng.integers(1, 11, n_doc)
    source = rng.choice(["web", "book"], n_doc)
    # lang correlated with source -> strictly positive MI
    lang = np.where(
        source == "web",
        np.where(rng.random(n_doc) < 0.7, "en", "fr"),
        np.where(rng.random(n_doc) < 0.7, "de", "fr"),
    )
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n_doc, dtype=np.int64),
            "text": [" ".join(["w"] * int(k)) for k in wc],
            "source": source,
            "lang": lang,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs), d / "documents.parquet",
        row_group_size=128,
    )
    return str(d)


def _duck(sf_dir, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_winsorized_mean(ray_session, sf_dir):
    got = _norm(winsorized_mean(sf_dir))
    exp = _norm(
        _duck(sf_dir, ["events"]).execute(
            "WITH b AS (SELECT event_type, "
            "quantile_disc(value, 0.05) AS b_lo, "
            "quantile_disc(value, 0.95) AS b_hi "
            "FROM events WHERE value IS NOT NULL GROUP BY event_type) "
            "SELECT e.event_type, "
            "round(avg(least(greatest(e.value, b.b_lo), b.b_hi)), 6) "
            "AS wmean FROM events e JOIN b USING (event_type) "
            "WHERE e.value IS NOT NULL GROUP BY e.event_type"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # degenerate groups behave: constant group == the constant,
    # single-row group == its value
    by = winsorized_mean(sf_dir).set_index("event_type")["wmean"]
    assert by["const"] == 7.5
    assert by["solo"] == 123.456


def test_corr_matrix(ray_session, sf_dir):
    got = corr_matrix(sf_dir).set_index(["col_a", "col_b"])["r"]
    # engineered pair: exactly linear => corr 1.0
    assert got[("l_quantity", "l_extendedprice")] == 1.0
    # zero-variance column => NULL (NaN), matching SQL corr()
    assert np.isnan(got[("l_quantity", "l_tax")])
    assert np.isnan(got[("l_discount", "l_tax")])
    exp = (
        _duck(sf_dir, ["lineitem"])
        .execute(
            "SELECT round(corr(l_quantity, l_discount), 6) AS a, "
            "round(corr(l_extendedprice, l_discount), 6) AS b "
            "FROM lineitem"
        )
        .df()
    )
    assert got[("l_quantity", "l_discount")] == exp["a"].iloc[0]
    assert got[("l_extendedprice", "l_discount")] == exp["b"].iloc[0]


def test_shuffle_head(ray_session, sf_dir):
    got = _norm(shuffle_head(sf_dir, k=37))
    exp = _norm(
        _duck(sf_dir, ["documents"]).execute(
            "SELECT CAST(row_number() OVER (ORDER BY h, doc_id) "
            "AS BIGINT) AS pos, doc_id, source FROM ("
            "SELECT doc_id, source, "
            "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))"
            "::UBIGINT AS h FROM documents) ORDER BY pos LIMIT 37"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # k beyond the corpus: every row appears exactly once, ranked
    full = shuffle_head(sf_dir, k=10_000)
    assert len(full) == 1200
    assert full["doc_id"].is_unique
    assert (full["pos"].to_numpy() == np.arange(1, 1201)).all()


def _tokens_duck():
    from fastparquet_ray.pipelines.flagship import ensure_encoded

    paths, _ = ensure_encoded("/root/testdata/sf0.001")
    con = duckdb.connect()
    lst = ", ".join(f"'{p}'" for p in paths)
    con.execute(
        f"CREATE VIEW toks AS SELECT * FROM read_parquet([{lst}])"
    )
    return con


def test_token_ffreq(ray_session):
    got = _norm(token_ffreq("/root/testdata/sf0.001"))
    exp = _norm(
        _tokens_duck().execute(
            "SELECT n AS n_occ, CAST(count(*) AS BIGINT) AS n_tokens "
            "FROM (SELECT tok, count(*) AS n FROM ("
            "SELECT unnest(tokens) AS tok FROM toks) GROUP BY tok) "
            "GROUP BY n"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # spectrum mass accounting: sum(n_occ * n_tokens) == corpus tokens
    total = _tokens_duck().execute(
        "SELECT sum(len(tokens)) FROM toks"
    ).fetchone()[0]
    assert int((got["n_occ"] * got["n_tokens"]).sum()) == int(total)


def test_rare_token_docs(ray_session):
    got = _norm(rare_token_docs("/root/testdata/sf0.001"))
    exp = _norm(
        _tokens_duck().execute(
            "WITH ex AS (SELECT doc_id, source, unnest(tokens) AS tok "
            "FROM toks), "
            "rare AS (SELECT tok FROM ex GROUP BY tok "
            "HAVING count(*) <= 2), "
            "hit AS (SELECT DISTINCT doc_id, source FROM ex "
            "JOIN rare USING (tok)) "
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs "
            "FROM hit GROUP BY source"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_rare_token_docs_empty_rare_set(ray_session, tmp_path):
    """max_n = 0 means NO token qualifies (every token occurs >= 1
    time) -> empty result frame, exercising the rare.size == 0 and
    all-rows-filtered partial paths."""
    out = rare_token_docs("/root/testdata/sf0.001", max_n=0)
    assert len(out) == 0


def test_quality_topp(ray_session, sf_dir):
    from fastparquet_ray.functions.textops import quality_topp

    got = _norm(quality_topp(sf_dir))
    exp = _norm(
        _duck(sf_dir, ["documents"]).execute(
            "WITH w AS (SELECT source, length(text) - "
            "length(replace(text, ' ', '')) + 1 AS words "
            "FROM documents), "
            "t AS (SELECT quantile_disc(words, 0.9) AS thr FROM w) "
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs "
            "FROM w, t WHERE w.words >= t.thr GROUP BY source"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_quality_topp_all_tied(ray_session, tmp_path):
    """Every doc has the same word count: the threshold equals it and
    ALL docs survive (ties at the quantile are inclusive)."""
    from fastparquet_ray.functions.textops import quality_topp

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(50, dtype=np.int64),
            "text": ["a b c"] * 50,
            "source": ["s0"] * 25 + ["s1"] * 25,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs), tmp_path / "documents.parquet"
    )
    out = quality_topp(str(tmp_path))
    assert out["n_docs"].tolist() == [25, 25]


def test_mutual_information(ray_session, sf_dir):
    from fastparquet_ray.functions.analytics import mutual_information

    got = mutual_information(sf_dir)["mi"].iloc[0]
    exp = (
        _duck(sf_dir, ["documents"])
        .execute(
            "WITH c AS (SELECT source, lang, "
            "CAST(count(*) AS DOUBLE) AS n FROM documents "
            "GROUP BY source, lang), "
            "tot AS (SELECT sum(n) AS N FROM c), "
            "s AS (SELECT source, sum(n) AS ns FROM c GROUP BY source), "
            "l AS (SELECT lang, sum(n) AS nl FROM c GROUP BY lang) "
            "SELECT round(sum((c.n / t.N) * "
            "ln((c.n * t.N) / (s.ns * l.nl))), 6) AS mi "
            "FROM c JOIN s USING (source) JOIN l USING (lang) "
            "CROSS JOIN tot t"
        )
        .fetchone()[0]
    )
    assert got == exp
    assert got > 0  # engineered source-lang dependence


def test_mutual_information_independent(ray_session, tmp_path):
    """A perfectly balanced product table has MI exactly 0."""
    from fastparquet_ray.functions.analytics import mutual_information

    rows = [(s, l) for s in ["a", "b"] for l in ["x", "y"] for _ in range(10)]
    docs = pd.DataFrame(rows, columns=["source", "lang"])
    pq.write_table(
        pa.Table.from_pandas(docs), tmp_path / "documents.parquet"
    )
    assert mutual_information(str(tmp_path))["mi"].iloc[0] == 0.0


def test_common_prefixes(ray_session):
    from fastparquet_ray.functions.dedup import common_prefixes

    got = _norm(common_prefixes("/root/testdata/sf0.001"))
    exp = _norm(
        _tokens_duck().execute(
            "SELECT array_to_string(tokens[1:8], '-') AS prefix, "
            "CAST(count(*) AS BIGINT) AS n_docs FROM toks "
            "WHERE len(tokens) >= 8 "
            "GROUP BY prefix HAVING count(*) >= 2"
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_common_prefixes_width_past_docs(ray_session):
    """w larger than every document: no row qualifies -> empty."""
    from fastparquet_ray.functions.dedup import common_prefixes

    out = common_prefixes("/root/testdata/sf0.001", w=100_000)
    assert len(out) == 0


def _clustered_enc():
    from fastparquet_ray.pipelines.flagship import ensure_encoded

    paths, out = ensure_encoded(
        "/root/testdata/sf0.001", cluster_by="doc_id"
    )
    return paths, out


def test_take_row_range_spans_shards(ray_session):
    from fastparquet_ray.pipelines.decode import take_row_range

    paths, out = _clustered_enc()
    lst = ", ".join(f"'{p}'" for p in paths)
    con = duckdb.connect()
    exp = con.execute(
        "SELECT doc_id, n_tok, source FROM ("
        "SELECT doc_id, n_tok, source, "
        "row_number() OVER (ORDER BY doc_id) - 1 AS pos "
        f"FROM read_parquet([{lst}])) "
        "WHERE pos >= 100 AND pos < 300 ORDER BY pos"
    ).df()
    got = take_row_range(out, 100, 300, columns=["doc_id", "n_tok", "source"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp, check_dtype=False
    )


def test_take_row_range_edges(ray_session):
    from fastparquet_ray.pipelines.decode import take_row_range

    _, out = _clustered_enc()
    total = sum(
        int(r["rows"])
        for r in __import__(
            "fastparquet_ray.state.manifest", fromlist=["Manifest"]
        ).Manifest(out).load_records().values()
    )
    # stop clamps to total; start beyond total -> empty
    assert len(take_row_range(out, total - 5, total + 99)) == 5
    assert len(take_row_range(out, total + 10, total + 20)) == 0
    # empty interval
    assert len(take_row_range(out, 7, 7)) == 0
    # full corpus slice is the whole sorted table
    full = take_row_range(out, 0, total, columns=["doc_id"])
    assert len(full) == total
    assert full["doc_id"].is_monotonic_increasing


def test_take_row_range_rejects_unclustered(ray_session):
    from fastparquet_ray.pipelines.decode import take_row_range
    from fastparquet_ray.pipelines.flagship import ensure_encoded

    _, out = ensure_encoded("/root/testdata/sf0.001")  # unclustered
    with pytest.raises(ValueError, match="cluster"):
        take_row_range(out, 0, 10)


def test_encoded_dataset_take_range_api(ray_session):
    import fastparquet_ray as fr

    _, out = _clustered_enc()
    df = fr.EncodedDataset(out).take_range(42, 52, columns=["doc_id"])
    assert len(df) == 10
    assert df["doc_id"].is_monotonic_increasing


def test_sorted_detect_files_mixed(ray_session, tmp_path, monkeypatch):
    """One sorted and one unsorted fragment: pair counts and verdicts
    must discriminate (the all-False degenerate cannot pass)."""
    from fastparquet_ray.pipelines import flagship

    a = pd.DataFrame(
        {"doc_id": ["a/1", "b/2", "c/3"], "n_tok": [1, 2, 3]}
    )
    b = pd.DataFrame(
        {"doc_id": ["z/9", "a/1", "m/5"], "n_tok": [5, 1, 9]}
    )
    pq.write_table(pa.Table.from_pandas(a), tmp_path / "tokens-0.parquet")
    pq.write_table(pa.Table.from_pandas(b), tmp_path / "tokens-1.parquet")
    monkeypatch.setattr(flagship, "sf_from_dir", lambda d: 0.0)
    monkeypatch.setattr(
        flagship, "ensure_tokens_dataset",
        lambda sf, base=None: [
            str(tmp_path / "tokens-0.parquet"),
            str(tmp_path / "tokens-1.parquet"),
        ],
    )
    out = flagship.sorted_detect_files("ignored").set_index("file")
    assert bool(out.loc["tokens-0.parquet", "doc_sorted"]) is True
    assert out.loc["tokens-0.parquet", "doc_sorted_pairs"] == 2
    assert bool(out.loc["tokens-1.parquet", "doc_sorted"]) is False
    assert out.loc["tokens-1.parquet", "doc_sorted_pairs"] == 1
    assert out.loc["tokens-1.parquet", "ntok_sorted_pairs"] == 1
