"""editdist_neardup (Ed-Join family): exact all-pairs oracle on an
adversarial synthetic corpus — distances 0/1/2 (kept) and 3+
(dropped), keys shorter than the gram-filter floor (reserved bucket),
a non-ASCII key (bypasses the byte-gram math), ties of near-identical
openings across sources, and multi-block row groups."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastparquet_ray.functions.dedup import (
    _levenshtein_pairs,
    _qgram_sets,
    editdist_neardup,
)


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("editdist_sf")
    rng = np.random.default_rng(42)
    base = (
        "the quick brown fox jumps over the lazy dog and keeps on "
        "running through the field"
    )
    texts = [
        base,                                   # 0: anchor
        base,                                   # 1: dist 0 to anchor
        "The quick brown fox jumps over the lazy dog!!!",  # 2: dist 0
        # (case-normalized 40-char prefix equals the anchor's)
        "thX quick brown fox jumps over the lazy dog",      # 3: dist 1
        "thXYquick brown fox jumps over the lazy dog",      # 4: dist 2
        "XXX quick brown fox jumps over the lazy dog",      # 5: dist 3
        "short",                                 # 6: reserved bucket
        "shortx",                                # 7: dist 1 to 6
        "tiny",                                  # 8: < q chars
        "tin",                                   # 9: dist 1 to 8
        "café au lait and a very long tail after it",  # 10: non-ascii
        # byte-level dist 2 to 10 (é is two UTF-8 bytes — DuckDB's
        # levenshtein scores bytes, and so does the engine)
        "cafe au lait and a very long tail after it",       # 11
    ]
    # random fillers that pair with nothing
    alpha = list("abcdefghijklmnopqrstuvwxyz ")
    for _ in range(300):
        texts.append("".join(rng.choice(alpha, 60)))
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["src0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs), d / "documents.parquet",
        row_group_size=64,
    )
    return str(d)


def _oracle(sf_dir: str, k: int) -> pd.DataFrame:
    con = duckdb.connect()
    return con.execute(
        "SELECT id_a, id_b, dist FROM ("
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "levenshtein(lower(substr(a.text, 1, 40)), "
        "lower(substr(b.text, 1, 40)))::BIGINT AS dist "
        f"FROM '{sf_dir}/documents.parquet' a "
        f"JOIN '{sf_dir}/documents.parquet' b ON a.doc_id < b.doc_id"
        f") WHERE dist <= {k} ORDER BY id_a, id_b"
    ).df()


def test_editdist_neardup_vs_allpairs_oracle(ray_session, sf_dir):
    got = editdist_neardup(sf_dir).reset_index(drop=True)
    exp = _oracle(sf_dir, 2)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    pairs = set(zip(got["id_a"], got["id_b"]))
    # the adversarial pairs all survive: exact, dist-1, dist-2, the
    # short-bucket pair, the sub-q-gram pair and the non-ascii pair
    for want in [(0, 1), (0, 2), (0, 3), (0, 4), (6, 7), (8, 9)]:
        assert want in pairs, want
    assert (10, 11) in pairs  # multibyte key, byte-level dist 2
    assert (0, 5) not in pairs, "dist-3 pair leaked at k=2"


def test_editdist_k3_widens(ray_session, sf_dir):
    got = editdist_neardup(sf_dir, k=3).reset_index(drop=True)
    exp = _oracle(sf_dir, 3)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (0, 5) in set(zip(got["id_a"], got["id_b"]))


def test_levenshtein_kernel_vs_duckdb():
    rng = np.random.default_rng(7)
    alpha = list("abcde")
    pairs = []
    for _ in range(200):
        la, lb = rng.integers(0, 12, 2)
        pairs.append(
            ("".join(rng.choice(alpha, la)), "".join(rng.choice(alpha, lb)))
        )
    la = np.array([len(a) for a, _ in pairs])
    lb = np.array([len(b) for _, b in pairs])
    lmax = max(1, la.max(), lb.max())
    A = np.zeros((len(pairs), lmax), np.uint8)
    B = np.full((len(pairs), lmax), 255, np.uint8)
    for r, (a, b) in enumerate(pairs):
        A[r, : len(a)] = np.frombuffer(a.encode(), np.uint8)
        B[r, : len(b)] = np.frombuffer(b.encode(), np.uint8)
    mine = _levenshtein_pairs(A, la, B, lb)
    con = duckdb.connect()
    ref = [
        con.execute(f"select levenshtein('{a}','{b}')").fetchone()[0]
        for a, b in pairs
    ]
    assert mine.tolist() == ref


def test_qgram_sets_dedup_and_offsets():
    buf = np.frombuffer(b"abcdefgabcdabcd", np.uint8)
    offs = np.array([0, 7, 15], dtype=np.int64)
    d, g = _qgram_sets(buf, offs, 4)
    # doc 0: 4 distinct grams of "abcdefg"; doc 1 ("abcdabcd"): 5
    # windows but only 4 DISTINCT grams ("abcd" repeats)
    assert d.tolist() == [0, 0, 0, 0, 1, 1, 1, 1]
    v = np.frombuffer(b"abcd", np.uint8).view(np.uint32)[0]
    assert int(v) in g[d == 1].tolist()


def test_doc_dup_profile(ray_session, sf_dir):
    from fastparquet_ray.functions.dedup import doc_dup_profile

    got = doc_dup_profile(sf_dir)
    exp = duckdb.connect().execute(
        "SELECT source, CAST(count(*) AS BIGINT) AS docs, "
        "CAST(count(DISTINCT text) AS BIGINT) AS n_distinct, "
        "ROUND(1 - count(DISTINCT text)::DOUBLE / count(*), 6) AS dup_rate "
        f"FROM '{sf_dir}/documents.parquet' GROUP BY source ORDER BY source"
    ).df()
    pd.testing.assert_frame_equal(
        got, exp, check_dtype=False, atol=1e-9
    )
    # the fixture has one exact dup pair -> dup_rate > 0
    assert got["dup_rate"].max() > 0


def test_pii_scrub_parity(ray_session, tmp_path):
    """Python re and DuckDB RE2 redact ADVERSARIAL strings
    identically: emails with dots/plus, IPs inside sentences, phones
    with dashes, an IP-like tail inside an email, and no-PII text."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fastparquet_ray.functions.textops import pii_scrub

    texts = [
        "contact a.b+tag@sub.example.io today",
        "server at 10.0.0.1 and 255.255.255.255 end",
        "call +1-555-123-4567 now",
        "weird a@1.2.3.4 stays an ip-less email candidate",
        "no pii at all here",
        "double x@y.zz then 8.8.8.8 then +49-30-1234567",
        "",
    ]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    d = tmp_path / "pii"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(docs), d / "documents.parquet")
    got = (
        pii_scrub(str(d))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = duckdb.connect().execute(
        "SELECT doc_id, "
        "regexp_replace(regexp_replace(regexp_replace(text, "
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', "
        "'<EMAIL>', 'g'), "
        "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', "
        "'<IP>', 'g'), "
        "'\\+\\d[\\d\\-]{7,}\\d', '<PHONE>', 'g') AS text_redacted, "
        "CAST(len(regexp_extract_all(text, "
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) "
        "AS n_email, "
        "CAST(len(regexp_extract_all(text, "
        "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) "
        "AS n_ipv4, "
        "CAST(len(regexp_extract_all(text, "
        "'\\+\\d[\\d\\-]{7,}\\d')) AS BIGINT) AS n_phone "
        f"FROM '{d}/documents.parquet' ORDER BY doc_id"
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got["n_email"].sum() == 2  # a@1.2.3.4 is not an email (TLD)
    assert "<EMAIL>" in got["text_redacted"].iloc[0]
    assert "<IP>" in got["text_redacted"].iloc[1]
    assert "<PHONE>" in got["text_redacted"].iloc[2]
