"""edit1_pairs (FastSS deletion-blocking join) and phrase_count
(positional adjacency) semantics."""

import itertools

import pyarrow as pa


def test_is_edit1_exact_semantics():
    from smartreader_ray.functions.fuzzy import is_edit1

    assert is_edit1("cat", "cut")          # substitution
    assert is_edit1("cat", "cats")         # insertion
    assert is_edit1("cat", "at")           # deletion
    assert not is_edit1("cat", "cat")      # distance 0
    assert not is_edit1("cat", "tac")      # distance 2
    assert not is_edit1("ab", "ba")        # transposition = distance 2
    assert not is_edit1("cat", "catss")    # distance 2 (two inserts)
    assert is_edit1("", "a")
    assert not is_edit1("", "")


def _brute_pairs(vals):
    from smartreader_ray.functions.fuzzy import is_edit1

    def lev(a, b):
        # full DP, the independent ground truth
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1,
                    prev + (a[i - 1] != b[j - 1]))
        return d[n]

    vals = sorted(set(vals))
    out = set()
    for a, b in itertools.combinations(vals, 2):
        assert is_edit1(a, b) == (lev(a, b) == 1)
        if lev(a, b) == 1:
            out.add((a, b))
    return out


def test_edit1_pairs_matches_bruteforce(ray_session):
    import ray.data

    from smartreader_ray.functions.fuzzy import edit1_pairs

    vals = ["node01", "node02", "node1", "nodeXX", "ode01",
            "node01", "anode01", "zebra", "zebr", "zzebra", "xx", "x"]
    ds = ray.data.from_arrow(pa.table({"name": vals})).repartition(3)
    got = {(r["a"], r["b"]) for r in edit1_pairs(ds, "name").take_all()}
    assert got == _brute_pairs(vals)
    assert ("node01", "node02") in got
    assert ("node01", "node1") in got


def test_phrase_count_overlap_and_zero_groups(ray_session):
    import ray.data

    from smartreader_ray.functions.ngrams import phrase_count

    t = pa.table({
        "source": ["s1", "s1", "s2", "s3"],
        "text": [
            "a a a b",        # 'a a' occurs twice (overlapping)
            "x a a y a a z",  # twice more, one doc
            "a b a b",        # zero
            "a a",            # once
        ],
    })
    out = phrase_count(ray.data.from_arrow(t).repartition(2),
                       "a", "a").take_all()
    got = {r["source"]: (r["n_docs"], r["n_occ"]) for r in out}
    assert got == {"s1": (2, 4), "s2": (0, 0), "s3": (1, 1)}
