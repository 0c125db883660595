"""Property-based tests (hypothesis) — the randomized layer of the test
strategy (SURVEY.md §5): engine ops vs independent pandas/python oracles on
arbitrary small inputs."""

from __future__ import annotations

import re

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vector_spark.conditions import compile_condition
from vector_spark.functions.grok import grok_to_regex

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-100, max_value=100),
        st.sampled_from(["a", "b", "c", None]),
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=25,
)


@given(rows=rows_strategy, thr=st.integers(min_value=-100, max_value=100))
@settings(**SETTINGS)
def test_condition_filter_matches_pandas(spark, rows, thr):
    df = spark.createDataFrame(rows, "n long, s string, v double")
    cond = f'.n >= {thr} && exists(.s) || .s == "a"'
    got = df.filter(compile_condition(cond)).count()
    pdf = pd.DataFrame(rows, columns=["n", "s", "v"])
    want = int(
        (((pdf.n >= thr) & pdf.s.notna()) | (pdf.s == "a")).sum()
    )
    assert got == want


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_dedupe_matches_pandas(spark, rows):
    from vector_spark.operators import dedupe

    df = spark.createDataFrame(rows, "n long, s string, v double")
    got = dedupe(df, match=["n", "s"]).count()
    pdf = pd.DataFrame(rows, columns=["n", "s", "v"])
    want = len(pdf.drop_duplicates(subset=["n", "s"]))
    assert got == want


@given(rows=rows_strategy, rate=st.integers(min_value=1, max_value=5))
@settings(**SETTINGS)
def test_sample_counter_rate_bounds(spark, rows, rate):
    from vector_spark.operators import sample

    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)], "i long, n long, s string, v double"
    )
    kept = sample(df, rate=rate, group_by=["s"], order_by="i").count()
    # each group of size g keeps ceil(g/rate)
    pdf = pd.DataFrame(rows, columns=["n", "s", "v"])
    want = sum(-(-g // rate) for g in pdf.groupby("s", dropna=False).size())
    assert kept == want


@given(
    words=st.lists(
        st.sampled_from("alpha beta gamma delta eps zeta".split()),
        min_size=4,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_minhash_jaccard_identical_docs(spark, words):
    from vector_spark.dataprep import dedup as dd

    text = " ".join(words)
    df = spark.createDataFrame([(1, text), (2, text)], "doc_id long, text string")
    pairs = dd.minhash_near_dups(df, threshold=0.99).collect()
    # identical docs always collide in every band and have jaccard 1.0
    assert len(pairs) == 1 and pairs[0].jaccard == 1.0


@given(
    fields=st.lists(
        st.sampled_from(["ip", "verb", "code", "host", "path"]),
        min_size=1,
        max_size=3,
        unique=True,
    )
)
@settings(max_examples=20, deadline=None)
def test_grok_expansion_compiles_and_captures(fields):
    pats = {"ip": "IPV4", "verb": "WORD", "code": "NUMBER", "host": "HOSTNAME", "path": "PATH"}
    samples = {"ip": "1.2.3.4", "verb": "GET", "code": "207", "host": "x.example.com", "path": "/a/b"}
    pattern = " ".join(f"%{{{pats[f]}:{f}}}" for f in fields)
    regex, got_fields = grok_to_regex(pattern)
    assert got_fields == fields
    line = " ".join(samples[f] for f in fields)
    m = re.match(regex, line)
    assert m is not None
    for f in fields:
        assert m.group(re.sub(r"\W", "_", f)) == samples[f]


@given(
    a=st.lists(st.sampled_from("pqrstuv"), min_size=1, max_size=8, unique=True),
    b=st.lists(st.sampled_from("pqrstuv"), min_size=1, max_size=8, unique=True),
)
@settings(**SETTINGS)
def test_jaccard_symmetry_and_bounds(spark, a, b):
    from vector_spark.dataprep.dedup import jaccard

    df = spark.createDataFrame([(a, b)], "a array<string>, b array<string>")
    ab = df.select(jaccard(F.col("a"), F.col("b")).alias("j")).collect()[0].j
    ba = df.select(jaccard(F.col("b"), F.col("a")).alias("j")).collect()[0].j
    assert ab == ba and 0.0 <= ab <= 1.0
    sa, sb = set(a), set(b)
    assert abs(ab - len(sa & sb) / len(sa | sb)) < 1e-9


@given(rows=rows_strategy, thr=st.integers(min_value=-50, max_value=50))
@settings(**SETTINGS)
def test_route_copy_semantics_vs_pandas(spark, rows, thr):
    """Every row lands in exactly its matching routes; non-matchers land
    only in _unmatched (reference route.rs:42-52 copy semantics)."""
    from vector_spark.operators.route import route_label

    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)], "i long, n long, s string, v double"
    )
    out = route_label(
        df, {"big": f".n >= {thr}", "has_s": "exists(.s)"}
    ).groupBy("route").count().collect()
    got = {r.route: r["count"] for r in out}
    pdf = pd.DataFrame(rows, columns=["n", "s", "v"])
    big, has_s = (pdf.n >= thr), pdf.s.notna()
    want = {}
    if int(big.sum()):
        want["big"] = int(big.sum())
    if int(has_s.sum()):
        want["has_s"] = int(has_s.sum())
    unmatched = int((~big & ~has_s).sum())
    if unmatched:
        want["_unmatched"] = unmatched
    assert got == want


cef_field = st.text(
    alphabet=st.characters(
        codec="ascii", min_codepoint=0x20, max_codepoint=0x7E
    ),
    min_size=1,
    max_size=20,
)


@given(
    vendor=cef_field, product=cef_field, name=cef_field,
    sev=st.integers(min_value=0, max_value=10),
)
@settings(**SETTINGS)
def test_encode_cef_parse_cef_roundtrip(spark, vendor, product, name, sev):
    """Header fields containing pipes/backslashes/equals survive the
    encode→parse round-trip losslessly (escape-aware on both sides)."""
    from vector_spark.functions.parse import encode_cef, parse_cef

    df = spark.createDataFrame([(vendor, product, name, sev)],
                               "v string, p string, n string, s long")
    line = df.select(
        encode_cef(F.col("v"), F.col("p"), F.lit("1.0"), F.lit("100"),
                   F.col("n"), F.col("s"), []).alias("c")
    ).collect()[0].c
    r = (
        spark.createDataFrame([(line,)], "m string")
        .select(parse_cef(F.col("m")).alias("r"))
        .collect()[0].r
    )
    assert r.device_vendor == vendor
    assert r.device_product == product
    assert r.name == name
    assert r.severity == str(sev)


ilp_ident = st.text(
    alphabet=st.characters(
        codec="ascii", min_codepoint=0x21, max_codepoint=0x7E,
        exclude_characters='"\\',
    ),
    min_size=1,
    max_size=12,
)


@given(
    meas=ilp_ident, tagk=ilp_ident, tagv=ilp_ident,
    fint=st.integers(min_value=-10**9, max_value=10**9),
    ffloat=st.floats(allow_nan=False, allow_infinity=False, width=32),
    fbool=st.booleans(),
    ts=st.integers(min_value=0, max_value=2**62),
)
@settings(**SETTINGS)
def test_encode_influxdb_parse_roundtrip(
    spark, meas, tagk, tagv, fint, ffloat, fbool, ts
):
    """Identifiers containing commas/spaces/equals survive the
    encode→parse round-trip; int/float/bool field values come back as
    the reference decoder's gauge doubles."""
    from vector_spark.functions.parse import (
        encode_influxdb, ilp_field_bool, ilp_field_float, ilp_field_int,
        parse_influxdb,
    )

    df = spark.createDataFrame(
        [(meas, tagv, fint, float(ffloat), fbool, ts)],
        "m string, tv string, fi long, ff double, fb boolean, ts long",
    )
    line_df = df.select(
        encode_influxdb(
            F.col("m"),
            [(tagk, F.col("tv"))],
            [
                ("i1", ilp_field_int(F.col("fi"))),
                ("f1", ilp_field_float(F.col("ff"))),
                ("b1", ilp_field_bool(F.col("fb"))),
            ],
            ts_ns=F.col("ts"),
        ).alias("line")
    )
    rows = line_df.select(
        F.explode(parse_influxdb(F.col("line"))).alias("g")
    ).select("g.*").collect()
    got = {r.name: r for r in rows}
    assert set(got) == {f"{meas}_i1", f"{meas}_f1", f"{meas}_b1"}
    for r in rows:
        assert dict(r.tags) == {tagk: tagv}
        assert r.ts_ns == ts
    assert got[f"{meas}_i1"].value == float(fint)
    assert got[f"{meas}_f1"].value == float(ffloat)
    assert got[f"{meas}_b1"].value == (1.0 if fbool else 0.0)


@given(
    lens=st.lists(st.integers(min_value=0, max_value=13), min_size=1, max_size=20),
    seq_len=st.integers(min_value=1, max_value=8),
)
@settings(**SETTINGS)
def test_pack_tokens_matches_python_packing(spark, lens, seq_len):
    from vector_spark.dataprep.packing import pack_tokens

    docs = []
    tok = 0
    for i, n in enumerate(lens):
        docs.append((i, list(range(tok, tok + n)), n))
        tok += n
    d = spark.createDataFrame(docs, "_i long, tokens array<int>, n_tok long")
    out = {r.chunk_id: list(r.tokens)
           for r in pack_tokens(d, seq_len=seq_len, order_col="_i",
                                bucket_size=3).collect()}
    stream = list(range(tok))  # concatenation in _i order by construction
    want = {k: stream[k * seq_len:(k + 1) * seq_len]
            for k in range((len(stream) + seq_len - 1) // seq_len)}
    assert out == want


@given(
    toks=st.lists(st.integers(min_value=0, max_value=4999), min_size=0, max_size=40),
    rate=st.sampled_from([0.0, 0.2, 0.9, 1.0]),
)
@settings(**SETTINGS)
def test_span_corrupt_reconstructs(spark, toks, rate):
    from vector_spark.dataprep.tokens import SPAN_SENTINEL_BASE, span_corrupt

    d = spark.createDataFrame([("d0", toks)], "doc_id string, tokens array<int>")
    r = span_corrupt(d, rate=rate).collect()[0]
    spans: dict[int, list[int]] = {}
    cur: list[int] | None = None
    for t in r.targets:
        if t >= SPAN_SENTINEL_BASE:
            cur = spans.setdefault(t, [])
        else:
            assert cur is not None
            cur.append(t)
    rebuilt: list[int] = []
    for t in r.inputs:
        rebuilt.extend(spans[t] if t >= SPAN_SENTINEL_BASE else [t])
    assert rebuilt == list(toks)
    if rate == 0.0:
        assert list(r.inputs) == list(toks) and list(r.targets) == []


@given(
    n=st.integers(min_value=0, max_value=60),
    width=st.integers(min_value=1, max_value=12),
    stride_frac=st.integers(min_value=1, max_value=12),
)
@settings(**SETTINGS)
def test_strided_chunks_cover_exactly_once_by_n_new(spark, n, width, stride_frac):
    """The strided-perplexity invariant: concatenating each chunk's LAST
    n_new tokens reproduces the document exactly once, in order."""
    from vector_spark.dataprep.tokens import strided_chunks

    stride = min(stride_frac, width)
    d = spark.createDataFrame(
        [("d", list(range(100, 100 + n)), n)],
        "doc_id string, tokens array<int>, n_tok long",
    )
    rows = sorted(
        strided_chunks(d, width=width, stride=stride).collect(),
        key=lambda r: r.chunk_idx,
    )
    if n == 0:
        assert rows == []
        return
    rebuilt = []
    for r in rows:
        assert 1 <= r.n_ctx <= width and len(r.tokens) == r.n_ctx
        assert r.n_new >= 1  # no fully-overlapped (useless) chunk is emitted
        rebuilt.extend(list(r.tokens)[-r.n_new:])
    assert rebuilt == list(range(100, 100 + n))


@given(
    lens=st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=15),
    seq_len=st.integers(min_value=1, max_value=6),
)
@settings(**SETTINGS)
def test_pack_token_segments_partitions_chunks(spark, lens, seq_len):
    from vector_spark.dataprep.packing import pack_token_segments

    docs = [(i, n) for i, n in enumerate(lens)]
    d = spark.createDataFrame(docs, "_i long, n_tok long")
    total = sum(lens)
    segs = {r.chunk_id: list(r.seg_lens)
            for r in pack_token_segments(d, seq_len=seq_len, order_col="_i",
                                         bucket_size=3).collect()}
    n_chunks = (total + seq_len - 1) // seq_len
    assert set(segs) == set(range(n_chunks))
    for cid, ls in segs.items():
        expect = seq_len if cid < n_chunks - 1 else total - cid * seq_len
        assert sum(ls) == expect and all(x > 0 for x in ls)
    # every non-empty doc contributes ceil-bounded segments: one per
    # chunk it overlaps
    expect_segments = 0
    pos = 0
    for _, nl in docs:
        if nl > 0:
            expect_segments += (pos + nl - 1) // seq_len - pos // seq_len + 1
            pos += nl
    assert sum(len(v) for v in segs.values()) == expect_segments


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    text=st.text(
        alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
        min_size=0, max_size=400,
    ),
    chunk=st.integers(8, 64),
    overlap=st.integers(0, 7),
)
def test_chunk_text_full_coverage_property(spark, text, chunk, overlap):
    # every character of the document appears in at least one chunk, the
    # first chunk starts at 0, consecutive chunks overlap by >= overlap
    # when both are full-size, and de-overlapped concatenation
    # reconstructs the document exactly
    from vector_spark.dataprep.text import chunk_text

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_text(df, chunk_chars=chunk, overlap=overlap).collect(),
        key=lambda r: r.chunk_index,
    )
    assert rows[0].char_start == 0
    rebuilt = rows[0].chunk_text or ""
    for prev, cur in zip(rows, rows[1:]):
        taken = prev.char_start + len(prev.chunk_text or "")
        rebuilt += (cur.chunk_text or "")[taken - cur.char_start:]
    assert rebuilt == text
    # chunk ids are unique and stable
    assert len({r.chunk_id for r in rows}) == len(rows)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    arr=st.lists(st.text(alphabet="abcdef", min_size=0, max_size=5),
                 min_size=0, max_size=8),
)
def test_vrl_closure_matches_python_semantics(spark, arr):
    # filter/map_values closures over an array column agree with the
    # same lambda evaluated in python
    from vector_spark.vrl import remap_program

    df = spark.createDataFrame([(arr,)], "tags array<string>")
    src = (
        '.kept = filter(array!(.tags)) -> |i, v| { length(v) > 2 }\n'
        '.up = map_values(array!(.tags)) -> |v| { upcase(v) }\n'
        "n = 0\n"
        "for_each(array!(.tags)) -> |_i, v| { n = n + length(v) }\n"
        ".total = n"
    )
    out = remap_program(df, src)["primary"].collect()[0]
    assert out.kept == [v for v in arr if len(v) > 2]
    assert out.up == [v.upper() for v in arr]
    assert out.total == sum(len(v) for v in arr)


pairs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ).filter(lambda t: t[0] != t[1]),
    min_size=0,
    max_size=20,
)


@given(pairs=pairs_strategy)
@settings(**SETTINGS)
def test_leakage_safe_split_never_leaks(spark, pairs):
    """For ARBITRARY pair graphs (chains, cycles, stars, disjoint
    components), every near-dup pair's endpoints land in the same split
    and the audit reports zero leaked rows — the structural guarantee
    leakage_safe_split exists for. Oracle: python union-find."""
    from vector_spark.dataprep.mixing import (
        leakage_safe_split,
        split_leakage_audit,
    )

    docs = spark.createDataFrame([(i,) for i in range(31)], "doc_id long")
    pdf = spark.createDataFrame(
        pairs or [(0, 0)], "id_a long, id_b long"
    ).filter(F.col("id_a") != F.col("id_b"))
    out = leakage_safe_split(
        docs, pdf, {"train": 0.5, "val": 0.25, "test": 0.25}
    )
    rows = {r.doc_id: (r.split_key, r.split) for r in out.collect()}
    assert len(rows) == 31

    # python union-find oracle for the representative
    parent = list(range(31))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical rep = min member of the component
    comp = {}
    for i in range(31):
        comp.setdefault(find(i), []).append(i)
    rep = {m: min(ms) for ms in comp.values() for m in ms}
    for i in range(31):
        assert rows[i][0] == str(rep[i]), (i, rows[i], rep[i])
        assert rows[i][1] == rows[rep[i]][1]  # inherits rep's split

    audit = split_leakage_audit(pdf, out).collect()
    assert all(not r.leaked for r in audit)
