"""Tests for the phonetic / entity-resolution ops (`functions/fuzzy.py`:
soundex, levenshtein, soundex_tokens, resolve_entities) and boolean
retrieval (`functions/ngrams.py: boolean_search`)."""

import random
import string

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from smartreader_ray.functions.fuzzy import levenshtein, soundex

# the published American-Soundex test vectors (Knuth TAOCP vol. 3 /
# US National Archives examples)
SOUNDEX_VECTORS = {
    "Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
    "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
    "Honeyman": "H555", "Jackson": "J250", "Washington": "W252",
    "Lee": "L000", "Gutierrez": "G362", "a": "A000",
}


class TestSoundex:
    def test_published_vectors(self):
        for w, code in SOUNDEX_VECTORS.items():
            assert soundex(w) == code, w

    def test_no_letters(self):
        assert soundex("123") == ""
        assert soundex("") == ""

    def test_sql_chain_parity(self):
        # the oracle replays soundex as an RE2-safe expression chain;
        # prove the Python impl and that chain agree on random words
        con = duckdb.connect()
        sql = """
        WITH t AS (SELECT unnest($words) AS w),
        s1 AS (SELECT w, regexp_replace(upper(w), '[^A-Z]', '', 'g')
                   AS u FROM t),
        s2 AS (SELECT w, u, substr(u,1,1) ||
                   translate(substr(u,2), 'HW', '') AS u2
               FROM s1 WHERE length(u) > 0),
        s3 AS (SELECT w, u, translate(u2,
                   'BFPVCGJKQSXZDTLMNRAEIOUYHW',
                   '11112222222233455600000000') AS c FROM s2),
        s4 AS (SELECT w, u, regexp_replace(regexp_replace(
                   regexp_replace(regexp_replace(regexp_replace(
                   regexp_replace(regexp_replace(c,
                   '0{2,}','0','g'), '1{2,}','1','g'), '2{2,}','2','g'),
                   '3{2,}','3','g'), '4{2,}','4','g'), '5{2,}','5','g'),
                   '6{2,}','6','g') AS coll FROM s3)
        SELECT w, substr(u,1,1) ||
               substr(replace(substr(coll,2),'0','') || '000', 1, 3)
        FROM s4
        """
        rng = random.Random(11)
        words = list(SOUNDEX_VECTORS) + [
            "".join(rng.choice(string.ascii_lowercase)
                    for _ in range(rng.randint(1, 12)))
            for _ in range(300)]
        for w, code in con.execute(sql, {"words": words}).fetchall():
            assert soundex(w) == code, w


class TestLevenshtein:
    def test_basics(self):
        assert levenshtein("", "") == 0
        assert levenshtein("abc", "") == 3
        assert levenshtein("kitten", "sitting") == 3

    def test_duckdb_differential(self):
        con = duckdb.connect()
        rng = random.Random(13)
        for _ in range(400):
            a = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 8)))
            b = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 8)))
            d = con.execute("select levenshtein($a,$b)",
                            {"a": a, "b": b}).fetchone()[0]
            assert levenshtein(a, b) == d, (a, b)


class TestResolveEntities:
    def _table(self):
        names = ["acme corp", "acme corp", "acmi corp", "zenith ltd",
                 "zenith ltd", "zenyth ltd", "solo inc"]
        return pa.table({
            "id": pa.array(range(len(names)), type=pa.int64()),
            "name": pa.array(names, type=pa.string()),
        })

    def test_known_clusters(self, ray_session):
        import ray.data

        from smartreader_ray.functions.fuzzy import resolve_entities

        got = resolve_entities(
            ray.data.from_arrow(self._table()), "id", "name",
        ).to_pandas()
        by_name = dict(zip(got["name"], got["canonical"]))
        assert by_name["acmi corp"] == "acme corp"
        assert by_name["zenyth ltd"] == "zenith ltd"
        assert by_name["solo inc"] == "solo inc"  # singleton keeps itself

    def test_partition_invariance(self, ray_session):
        import ray.data

        from smartreader_ray.functions.fuzzy import resolve_entities

        a = resolve_entities(
            ray.data.from_arrow(self._table()), "id", "name").to_pandas()
        b = resolve_entities(
            ray.data.from_arrow(self._table()).repartition(5),
            "id", "name").to_pandas()
        assert a.equals(b)

    def test_block_cap_raises(self, ray_session):
        import ray.data

        from smartreader_ray.functions.fuzzy import resolve_entities

        t = pa.table({
            "id": pa.array(range(40), type=pa.int64()),
            # all share the soundex of 'aaab...' variants? force one
            # block: identical token -> identical code
            "name": pa.array([f"acme v{i}" for i in range(40)]),
        })
        with pytest.raises(ValueError, match="block_cap"):
            resolve_entities(ray.data.from_arrow(t), "id", "name",
                             block_cap=8).to_pandas()


class TestBooleanSearch:
    def test_membership_semantics(self, ray_session):
        import ray.data

        from smartreader_ray.functions.ngrams import boolean_search

        t = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array([
                "spark join window", "spark join fast",
                "spark only here", "join only here"]),
        })
        got = boolean_search(
            ray.data.from_arrow(t).repartition(2),
            must=["spark", "join"], must_not=["window"],
        ).to_pandas()
        assert got["doc_id"].tolist() == [2]

    def test_requires_must(self, ray_session):
        import ray.data

        from smartreader_ray.functions.ngrams import boolean_search

        with pytest.raises(ValueError):
            boolean_search(ray.data.from_arrow(
                pa.table({"doc_id": [1], "text": ["x"]})), must=[])
