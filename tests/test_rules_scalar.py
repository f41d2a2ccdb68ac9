"""Golden tests for scalar commands — re-expressing the reference's
docstring ``#test`` cases (outils/tests/testmodule.py harness, SURVEY §5)
as table assertions. Test objects mirror the reference's ``#obj`` macro
fixtures: attrs C1,C2,C3,V1,V2 = AB,BCD,CDEF,12,234
(outils/tests/fichiers/testscripts/unittest.csv:2-18)."""

from __future__ import annotations

import pytest

from pyetl_spark.rules import Rule, RuleContext, apply_rules

from tests.conftest import rows


@pytest.fixture()
def objs(spark):
    """The reference's standard test objects (unittest.csv #obj macro)."""
    return spark.createDataFrame(
        [
            ("AB", "BCD", "CDEF", "12", "234", 1),
            ("AB", "BCD", "CDEF", "12", "234", 2),
            ("xy", "", None, "7", "0", 3),
        ],
        "C1 string, C2 string, C3 string, V1 string, V2 string, V0 int",
    )


def one_col(df, col):
    return [r[0] for r in df.select(col).orderBy("V0").collect()]


def test_set_from_attr(objs):
    out = apply_rules(objs, [Rule(op="set", out="X", inp="C1")])
    assert one_col(out, "X") == ["AB", "AB", "xy"]


def test_set_default_when_empty(objs):
    out = apply_rules(objs, [Rule(op="set", out="X", inp="C3", default="dflt")])
    assert one_col(out, "X") == ["CDEF", "CDEF", "dflt"]


def test_set_static_and_template(objs):
    out = apply_rules(
        objs,
        [
            Rule(op="set", out="S", default="hello"),
            Rule(op="set", out="T", default="v=[C1]!"),
        ],
    )
    assert one_col(out, "S") == ["hello"] * 3
    assert one_col(out, "T") == ["v=AB!", "v=AB!", "v=xy!"]


def test_set_param_binding(objs):
    ctx = RuleContext(params={"env": "prod"})
    out = apply_rules(objs, [Rule(op="set", out="E", default="P:env")], ctx)
    assert one_col(out, "E") == ["prod"] * 3


def test_setlist(objs):
    out = apply_rules(
        objs, [Rule(op="setlist", out="A,B", inp="C1,C3", default=",zz")]
    )
    assert one_col(out, "A") == ["AB", "AB", "xy"]
    assert one_col(out, "B") == ["CDEF", "CDEF", "zz"]


def test_setmatch(objs):
    out = apply_rules(objs, [Rule(op="setmatch", out="M", inp="C2", p1="B(C)D", p2="1")])
    assert one_col(out, "M") == ["C", "C", ""]


def test_setnonvide(objs):
    out = apply_rules(objs, [Rule(op="setnonvide", out="N", inp="C3,C2,C1")])
    assert one_col(out, "N") == ["CDEF", "CDEF", "xy"]


def test_setjoin_and_array(objs):
    out = apply_rules(
        objs,
        [
            Rule(op="setjoin", out="J", inp="C1,C2", p1="-"),
            Rule(op="setarray", out="ARR", inp="C1,C2"),
        ],
    )
    assert one_col(out, "J") == ["AB-BCD", "AB-BCD", "xy-"]
    assert one_col(out, "ARR")[0] == ["AB", "BCD"]


def test_calc_sql_expr(objs):
    out = apply_rules(
        objs, [Rule(op="calc", out="SUMV", p1="cast(V1 as double) + cast(V2 as double)")]
    )
    assert one_col(out, "SUMV") == [246.0, 246.0, 7.0]


def test_sub(objs):
    out = apply_rules(objs, [Rule(op="sub", out="S", inp="C2", p1="B(.)D", p2=r"<\1>")])
    assert one_col(out, "S") == ["<C>", "<C>", ""]


def test_upper_lower_strip_len(objs):
    out = apply_rules(
        objs,
        [
            Rule(op="lower", out="L", inp="C1"),
            Rule(op="upper", out="U", inp="C1"),
            Rule(op="len", out="LEN", inp="C2"),
            Rule(op="strip", out="ST", inp="C2", p1="BD"),
        ],
    )
    assert one_col(out, "L") == ["ab", "ab", "xy"]
    assert one_col(out, "U") == ["AB", "AB", "XY"]
    assert one_col(out, "LEN") == [3, 3, 0]
    assert one_col(out, "ST") == ["C", "C", ""]


def test_round_format(objs):
    out = apply_rules(
        objs,
        [
            Rule(op="calc", out="F", p1="cast(V1 as double) / 7"),
            Rule(op="round", out="R", inp="F", p1="2"),
            Rule(op="format", out="FMT", inp="C1,V1", p1="%s=%s"),
        ],
    )
    assert one_col(out, "R") == [1.71, 1.71, 1.0]
    assert one_col(out, "FMT") == ["AB=12", "AB=12", "xy=7"]


def test_split_and_splitgen(objs, spark):
    out = apply_rules(objs, [Rule(op="setjoin", out="CSV", inp="C1,C2,V1", p1=",")])
    out = apply_rules(out, [Rule(op="split", out="P0,P1,P2", inp="CSV", p1=",")])
    assert one_col(out, "P1") == ["BCD", "BCD", ""]

    gen = apply_rules(out, [Rule(op="splitgen", out="PIECE", inp="CSV", p1=",")])
    assert gen.count() == 9  # 3 rows x 3 pieces


def test_conditional_assignment_keeps_nonmatching(objs):
    out = apply_rules(
        objs, [Rule(op="set", out="C1", default="HIT", sel1="C1 =:AB")]
    )
    assert one_col(out, "C1") == ["HIT", "HIT", "xy"]


def test_minus_modifier_filters(objs):
    out = apply_rules(
        objs, [Rule(op="set", out="X", default="k", sel1="C1 =:AB", mod="-")]
    )
    assert out.count() == 2


def test_plus_modifier_duplicates(objs):
    out = apply_rules(
        objs, [Rule(op="set", out="C1", default="COPY", sel1="C1 =:xy", mod="+")]
    )
    assert out.count() == 4
    assert sorted(one_col(out.orderBy("C1"), "C1")) == ["AB", "AB", "COPY", "xy"]


def test_suppobj_drops_selected(objs):
    out = apply_rules(objs, [Rule(op="suppobj", sel1="C1 =:AB")])
    assert one_col(out, "C1") == ["xy"]


def test_ren_supp_garder(objs):
    out = apply_rules(
        objs,
        [
            Rule(op="ren", inp="C1", out="K1"),
            Rule(op="supp", inp="C2,C3"),
            Rule(op="garder", inp="K1,V0"),
        ],
    )
    assert set(out.columns) == {"K1", "V0"}


def test_checksum_matches_hashlib(objs):
    import hashlib

    out = apply_rules(objs, [Rule(op="checksum", out="H", inp="C1")])
    assert one_col(out, "H")[0] == hashlib.sha256(b"AB").hexdigest()
    out = apply_rules(objs, [Rule(op="checksum", out="H", inp="C1", p1="md5")])
    assert one_col(out, "H")[0] == hashlib.md5(b"AB").hexdigest()


def test_b64_roundtrip(objs):
    out = apply_rules(
        objs,
        [
            Rule(op="b64encode", out="B", inp="C2"),
            Rule(op="b64decode", out="D", inp="B"),
        ],
    )
    assert one_col(out, "D") == ["BCD", "BCD", ""]


def test_map_data_recode(objs):
    ctx = RuleContext(params={"m": {"AB": "toto", "xy": "titi"}})
    out = apply_rules(objs, [Rule(op="map_data", out="R", inp="C1", p1="m")], ctx)
    assert one_col(out, "R") == ["toto", "toto", "titi"]


def test_json_roundtrip(objs):
    out = apply_rules(
        objs,
        [
            Rule(op="tojson", out="J", inp="C1,V1"),
            Rule(op="json_get", out="G", inp="J", p1="C1"),
            Rule(op="jsonsplit", out="M", inp="J"),
            Rule(op="hget", out="HV", inp="M", p1="V1"),
        ],
    )
    assert one_col(out, "G") == ["AB", "AB", "xy"]
    assert one_col(out, "HV") == ["12", "12", "7"]


def test_hstore_ops(objs):
    out = apply_rules(
        objs,
        [
            Rule(op="hset", out="H", inp="C1,C2"),
            Rule(op="hget", out="G", inp="H", p1="C2"),
            Rule(op="hdel", out="H2", inp="H", p1="C1"),
            Rule(op="hsplit", inp="H", p1="C1,C2"),
        ],
    )
    first = out.orderBy("V0").first()
    assert first["G"] == "BCD"
    assert set(first["H2"].keys()) == {"C2"}


def test_namesplit_namejoin(spark):
    df = spark.createDataFrame([("a/b/c.txt",)], "p string")
    out = apply_rules(
        df,
        [
            Rule(op="namesplit", out="dir,base,ext", inp="p"),
            Rule(op="namejoin", out="joined", inp="dir,base"),
        ],
    )
    r = out.first()
    assert (r["dir"], r["base"], r["ext"], r["joined"]) == ("a/b", "c", "txt", "a/b/c")


def test_to_date_format(spark):
    df = spark.createDataFrame([("2024-03-01 10:00:00",)], "d string")
    out = apply_rules(
        df,
        [
            Rule(op="to_date", out="ts", inp="d", p1="yyyy-MM-dd HH:mm:ss"),
            Rule(op="date_format", out="s", inp="ts", p1="dd/MM/yyyy"),
        ],
    )
    assert out.first()["s"] == "01/03/2024"


def test_extractbloc(spark):
    df = spark.createDataFrame(
        [("fn foo{a{b}c} fn bar{d}",), ("none",)], "t string"
    )
    out = apply_rules(df, [Rule(op="extractbloc", out="blk", inp="t", p1="fn \\w+", p2="{}")])
    assert rows(out, "blk") == [("{a{b}c}",), ("{d}",)]


def test_cmd_cnt_and_getkey(spark):
    from pyetl_spark.rules import Rule, RuleContext, apply_rules

    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("b", 2), ("a", 2)], "k string, seq long"
    )
    out = apply_rules(
        df,
        [
            Rule(op="cnt", out="n", p1="seq"),               # global counter by seq
            Rule(op="cnt", out="occ", inp="k", p1="seq"),    # per-key occurrence
            Rule(op="getkey", out="kid", inp="k"),           # dense key per value
        ],
        RuleContext(),
    )
    rows = {(r["k"], r["seq"]): r for r in out.collect()}
    assert rows[("a", 1)]["n"] == 1 and rows[("a", 3)]["n"] == 4
    assert rows[("a", 1)]["occ"] == 1 and rows[("a", 3)]["occ"] == 3 and rows[("b", 2)]["occ"] == 1
    assert rows[("a", 1)]["kid"] == 1 and rows[("b", 2)]["kid"] == 2

    import pytest as _pt

    with _pt.raises(ValueError, match="explicit order"):
        apply_rules(df, [Rule(op="cnt", out="n")], RuleContext())


def test_crypt_decrypt_roundtrip(spark):
    """mirrors the reference #test (traitement_crypt.py:397): set X='toto',
    Y=crypt(X,'ffff'), Z=decrypt(Y,'ffff') → Z == 'toto'. Also: decrypt of a
    non-token keeps the input value, wrong key keeps ciphertext."""
    from pyetl_spark.rules import Rule, apply_rules

    df = spark.createDataFrame([("toto",), ("autre",), (None,)], "x string")
    rules = [
        Rule(op="crypt", out="y", inp="x", p1="ffff"),
        Rule(op="decrypt", out="z", inp="y", p1="ffff"),
        Rule(op="decrypt", out="bad", inp="y", p1="WRONG"),
        Rule(op="decrypt", out="raw", inp="x", p1="ffff"),
    ]
    out = apply_rules(df, rules).collect()
    for r in out:
        assert r["z"] == r["x"]                       # roundtrip
        if r["x"] is not None:
            assert r["y"] != r["x"]                   # actually encrypted
            # wrong key never yields plaintext (keeps the ciphertext input;
            # note Catalyst may inline the nondeterministic crypt per
            # consumer, so bad's ciphertext instance can differ from y's)
            assert r["bad"] != r["x"] and r["bad"].startswith("gAAAA")
            assert r["raw"] == r["x"]                 # non-token → keep input


def test_jsonsplit_recursive_flat(spark):
    """p2='flat' flattens nested dicts with '_'-joined keys (leading '_' as
    in the reference jflatten), json-encodes lists (traitement_alpha.py:1301)."""
    from pyetl_spark.rules import Rule, apply_rules

    df = spark.createDataFrame(
        [('{"a": "1", "b": {"c": "x", "d": {"e": "y"}}, "l": [1, 2]}',), ("not json",)],
        "j string",
    )
    out = apply_rules(df, [Rule(op="jsonsplit", out="h", inp="j", p2="flat")]).collect()
    assert out[0]["h"] == {"_a": "1", "_b_c": "x", "_b_d_e": "y", "_l": "[1, 2]"}
    assert out[1]["h"] is None


def test_txtstruct_and_infoatt(spark, capsys):
    """nested struct/array/map leaves all become strings, structure kept;
    infoatt prints the recursive type tree."""
    from pyetl_spark.rules import Rule, apply_rules

    df = spark.createDataFrame(
        [(1, {"n": 2, "arr": [1.5, 2.5], "m": {"k": 7}},)],
        "id int, payload struct<n int, arr array<double>, m map<string,int>>",
    )
    out = apply_rules(df, [Rule(op="txtstruct", out="txt", inp="payload"),
                           Rule(op="infoatt", inp="payload")])
    row = out.collect()[0]
    assert row["txt"]["n"] == "2"
    assert row["txt"]["arr"] == ["1.5", "2.5"]
    assert row["txt"]["m"] == {"k": "7"}
    printed = capsys.readouterr().out
    assert "analyse attribut payload" in printed and "array<double>" in printed


def test_is_file_is_dir_predicates(spark, tmp_path):
    """is:file / is:dir test the attr VALUE as a path
    (traitement_conditions.py:781-817)."""
    from pyetl_spark.rules.predicates import compile_predicate

    f = tmp_path / "exists.txt"
    f.write_text("x")
    df = spark.createDataFrame(
        [(str(f),), (str(tmp_path),), ("/no/such/thing",), (None,)], "p string"
    )
    files = [r["p"] for r in df.filter(compile_predicate("p is:file")).collect()]
    dirs = [r["p"] for r in df.filter(compile_predicate("p is:dir")).collect()]
    assert files == [str(f)]
    assert dirs == [str(tmp_path)]


def test_xmlextract_and_xmlsplit(spark):
    """mirrors the reference docstring tests (traitement_xml.py:91,133-134):
    extract an attribute of the first matching element; explode one row per
    element."""
    df = spark.createDataFrame(
        [(1, '<g><pp p1="toto" p2="titi"/><pp p1="tata" p2="tutu"/></g>'),
         (2, "<g><other/></g>")],
        "id int, v4 string",
    )
    one = apply_rules(df, [Rule(op="xmlextract", out="x", inp="v4", p1="pp.p2")])
    got = {r["id"]: r["x"] for r in one.collect()}
    assert got[1] == "titi"
    assert got[2] in (None, "")  # no match -> empty

    many = apply_rules(df, [Rule(op="xmlsplit", out="p1v", inp="v4", p1="pp.p1")])
    vals = sorted(r["p1v"] for r in many.collect())
    assert vals == ["tata", "toto"]  # id=2 dropped (zero elements)

    text = spark.createDataFrame([(1, "<g><t>a</t><t>b</t></g>")], "id int, v string")
    txt = apply_rules(text, [Rule(op="xmlsplit", out="tv", inp="v", p1="t")])
    assert sorted(r["tv"] for r in txt.collect()) == ["a", "b"]


def test_vround_scalar_and_array(spark):
    df = spark.createDataFrame([(1.536, [1.234, 2.567])], "x double, xs array<double>")
    out = apply_rules(df, [Rule(op="vround", out="r", inp="x", p1="2"),
                           Rule(op="vround", out="rs", inp="xs", p1="1")])
    row = out.collect()[0]
    assert row["r"] == 1.54
    assert row["rs"] == [1.2, 2.6]


def test_fail_gate(spark):
    """fail/abort data-quality gate (traitement_workflow.py:52,223): aborts
    when a guarded row exists, passes rows through untouched otherwise."""
    from pyetl_spark.rules.scalar import RuleAbort

    df = spark.createDataFrame([("a", 1), (None, 2)], "k string, v int")
    clean = df.filter("k is not null")
    out = apply_rules(clean, [Rule(op="fail", sel1="k is:null", p1="null key")])
    assert out.count() == 1  # gate holds, rows unchanged
    with pytest.raises(RuleAbort, match="null key"):
        apply_rules(df, [Rule(op="fail", sel1="k is:null", p1="null key")])
    with pytest.raises(RuleAbort):
        apply_rules(df, [Rule(op="abort")])  # unguarded abort always stops
