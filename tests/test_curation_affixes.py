"""source_affixes: min/max-LCP trick vs a naive per-source scan."""

import pyarrow as pa


def test_source_affixes_matches_naive(ray_session):
    import ray.data

    from smartreader_ray.functions.curation import source_affixes

    docs = {
        "a": ["HDR one mid TAIL", "HDR two other TAIL", "HDR 3 TAIL"],
        "b": ["xyz", "xyq"],
        "c": ["solo-doc"],          # single doc: affix = whole text
        "d": ["", "no-overlap"],    # empty string in the set -> 0/0
    }
    rows = [{"source": s, "text": t} for s, ts in docs.items()
            for t in ts]
    out = {r["source"]: r for r in
           source_affixes(ray.data.from_items(rows)).to_pandas()
           .to_dict("records")}

    def lcp(xs):
        p = xs[0]
        for x in xs[1:]:
            m = min(len(p), len(x))
            i = 0
            while i < m and p[i] == x[i]:
                i += 1
            p = p[:i]
        return p

    for s, ts in docs.items():
        r = out[s]
        pre, suf = lcp(ts), lcp([t[::-1] for t in ts])[::-1]
        assert r["n_docs"] == len(ts)
        assert (r["prefix_len"], r["common_prefix"]) == (len(pre), pre)
        assert (r["suffix_len"], r["common_suffix"]) == (len(suf), suf)
