"""Extension protocol, object patterns, external hooks, modify API, io."""

import numpy as np
import pyarrow as pa
import pytest

import joi_ray as jr
from joi_ray import build, compile_schema
from joi_ray.extend import register_rule
from joi_ray.kernels.util import RuleOut


def test_object_pattern_columns():
    s = jr.object({"fixed": jr.number()}).pattern(r"^meta_", jr.string().min(2))
    t = pa.table({"fixed": [1.0], "meta_a": ["ok"], "meta_b": ["x"], "other": ["?"]})
    res = compile_schema(s, prefs={"abort_early": False}).validate_table(t)
    codes = {(v["path"], v["code"]) for v in res.violations.to_pylist()}
    assert ("meta_b", "string.min") in codes
    assert ("other", "object.unknown") in codes
    assert ("meta_a", "string.min") not in codes
    assert set(res.value.column_names) == {"fixed", "meta_a", "meta_b", "other"}
    assert build(s.describe()) == s


def test_object_pattern_struct_fields():
    st = pa.struct([("meta_x", pa.string()), ("zz", pa.int64())])
    t = pa.table({"o": pa.array([{"meta_x": "a", "zz": 1}], type=st)})
    s = jr.object({"o": jr.object({}).pattern(r"^meta_", jr.string().min(3)).unknown()})
    res = compile_schema(s, prefs={"abort_early": False}).validate_table(t)
    assert [v["path"] for v in res.violations.to_pylist()] == ["o.meta_x"]


def test_custom_rule_registration():
    def make_even(args):
        def kernel(arr, env):
            v = arr.to_numpy(zero_copy_only=False)
            with np.errstate(invalid="ignore"):
                ok = np.nan_to_num(v % 2, nan=0.0) == 0
            return RuleOut(ok=ok)

        return kernel

    register_rule("number", "even", make_even)
    s = jr.object({"x": jr.number().rule_("even")})
    res = compile_schema(s).validate_table(pa.table({"x": [2.0, 3.0, None]}))
    assert list(res.ok) == [True, False, True]
    assert res.violations.to_pylist()[0]["code"] == "number.even"


def test_unknown_rule_still_raises():
    with pytest.raises(ValueError, match="unknown rule"):
        compile_schema(jr.object({"x": jr.string().rule_("nope_never_registered")}))


def test_external_hook():
    s = jr.object({"x": jr.number().external("numpy:isfinite")})
    res = compile_schema(s).validate_table(pa.table({"x": [1.0, float("nan")]}))
    # NaN fails the number base check before the external hook even runs
    assert list(res.ok) == [True, False]


def test_modify_api():
    s = jr.object({"a": jr.object({"b": jr.string()}), "c": jr.number()})
    assert s.extract("a.b").type == "string"
    s2 = s.fork("a.b", lambda n: n.required())
    assert s2.extract("a.b").flags.get("presence") == "required"
    assert "presence" not in s.extract("a.b").flags
    s3 = jr.object({"x": jr.string().alter({"post": lambda n: n.required()})})
    assert s3.tailor("post").extract("x").flags.get("presence") == "required"


def test_alter_tailor_reference_parity():
    """Node-verified against /root/reference (v16-rc2) in round 5:

    - duplicate alter targets append and apply IN ORDER (base.js:94-98
      pushes {target, adjuster}; tailor :562-571 applies each match)
    - tailor() takes a single name or a list (base.js:559 [].concat)
    - recursion follows the per-type overrides: object keys / patterns /
      assert-rule schemas (object.js:478-509), alternatives matches
      (alternatives.js:145-163) — and does NOT touch array items or
      base whens (no overrides exist for either)
    """
    # duplicate targets, registration order
    s = jr.number().alter({"x": lambda n: n.min(5)}).alter({"x": lambda n: n.max(9)})
    assert [(r["name"], r["args"]["limit"]) for r in s.tailor("x").rules] == [
        ("min", 5), ("max", 9)]
    # list of targets
    s2 = jr.number().alter({"a": lambda n: n.min(1), "b": lambda n: n.max(2)})
    assert [r["name"] for r in s2.tailor(["a", "b"]).rules] == ["min", "max"]
    assert [r["name"] for r in s2.tailor("a").rules] == ["min"]
    # array items are NOT tailored (reference has no array override)
    a = jr.array().items(jr.number().alter({"x": lambda n: n.min(5)}))
    assert a.tailor("x").terms["items"][0].rules == []
    # object patterns and assert-rule schemas ARE tailored
    o = (jr.object({"k": jr.number().alter({"x": lambda n: n.min(5)})})
         .pattern(r"^p", jr.string().alter({"x": lambda n: n.uppercase()})))
    ot = o.tailor("x")
    assert ot.terms["keys"]["k"].rules[0]["name"] == "min"
    assert ot.terms["patterns"][0]["schema"].rules[0]["name"] == "case"
    # (assert subjects must be global or depth>1 — object.js:209)
    oa = jr.object({"n": jr.object({"q": jr.number()})}).assert_(
        jr.ref("n.q"), jr.number().alter({"x": lambda n: n.min(3)}))
    art = [r for r in oa.tailor("x").rules if r["name"] == "assert"]
    assert art[0]["args"]["schema"].rules[0]["name"] == "min"
    with pytest.raises(ValueError, match="root level references"):
        jr.object({"q": jr.number()}).assert_(jr.ref("q"), jr.number())
    # alternatives matches ARE tailored
    alt = jr.alternatives(jr.number().alter({"x": lambda n: n.min(5)}))
    assert alt.tailor("x").terms["matches"][0].rules[0]["name"] == "min"
    # non-function adjuster / non-dict targets raise like the reference
    with pytest.raises(ValueError, match="must be a function"):
        jr.number().alter({"x": 3})
    with pytest.raises(ValueError, match="Invalid targets"):
        jr.number().alter(["x"])


def test_alterations_manifest_roundtrip():
    """manifest.js parity (node-verified r5): describe() carries
    [{target, adjuster}] with LIVE callables; build() re-alters (collapsing
    duplicate targets through a target-keyed object like manifest.js:
    339-346); JSON-stringified manifests lose the functions, so build() of
    the parsed form raises the adjuster assert — while from_json (joi_ray's
    own wire format) drops the inert alterations instead."""
    import json

    from joi_ray import build, from_json

    s = jr.number().alter({"x": lambda n: n.min(7)})
    d = s.describe()
    assert d["alterations"][0]["target"] == "x"
    assert callable(d["alterations"][0]["adjuster"])
    rb = build(d)
    assert [r["name"] for r in rb.tailor("x").rules] == ["min"]
    j = s.to_json()
    assert json.loads(j)["alterations"] == [{"target": "x"}]
    with pytest.raises(ValueError, match="must be a function"):
        build(json.loads(j))
    assert from_json(j).type == "number"  # alterations dropped, no raise
    # a user object key literally named "alterations" survives from_json
    uk = jr.object({"alterations": jr.string()})
    assert "alterations" in from_json(uk.to_json()).terms["keys"]
    # ref adjust= rides the in-memory manifest too (ref.js:195-199)
    r = jr.ref("q", adjust=lambda v: v + 1)
    rd = r.describe()
    assert callable(rd["adjust"])


def test_io_sources(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from joi_ray.sources.io import read_documents, read_table, write_violations

    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p)
    assert read_documents(p, columns=["a"]).take_all() == [{"a": 1}, {"a": 2}, {"a": 3}]
    import ray.data as rd

    out = str(tmp_path / "sink")
    write_violations(rd.from_arrow(t), out)
    assert pq.read_table(out).num_rows == 3
    csv = str(tmp_path / "t.csv")
    open(csv, "w").write("a,b\n1,x\n2,y\n")
    assert read_table(csv).count() == 2


def test_io_lance_roundtrip(ray_session, tmp_path):
    """Lance write -> read_documents with column pruning.  SKIPS (not
    silently passes) when the lance package is absent from the container;
    green the day it ships (VERDICT r2 item 5 — the north rule names Lance
    as the storage format)."""
    pytest.importorskip("lance")
    import lance

    from joi_ray.sources.io import HAVE_LANCE, read_documents

    assert HAVE_LANCE
    t = pa.table({
        "doc_id": ["doc-1", "doc-2"],
        "text": ["alpha", "beta"],
        "extra": [1, 2],
    })
    p = str(tmp_path / "docs.lance")
    lance.write_dataset(t, p)
    ds = read_documents(p, columns=["doc_id", "text"])
    rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
    # pruned read: only the requested columns come back
    assert rows == [
        {"doc_id": "doc-1", "text": "alpha"},
        {"doc_id": "doc-2", "text": "beta"},
    ]


def test_cli_describe_and_infer_subprocess(tmp_path):
    """CLI smoke without a Ray session: describe + infer round-trip."""
    import json
    import subprocess
    import sys

    import joi_ray as jr

    schema_path = tmp_path / "s.json"
    schema_path.write_text(jr.object({"x": jr.number().min(0)}).to_json())
    repo = "/root/repo"
    out = subprocess.run(
        [sys.executable, "-m", "joi_ray", "describe", "--schema", str(schema_path)],
        capture_output=True, text=True, cwd=repo, check=True,
    ).stdout
    assert json.loads(out)["keys"]["x"]["type"] == "number"
    out2 = subprocess.run(
        [sys.executable, "-m", "joi_ray", "infer", "--input", "/root/testdata/sf0.001/documents.parquet"],
        capture_output=True, text=True, cwd=repo, check=True,
    ).stdout
    inferred = json.loads(out2)
    assert inferred["keys"]["lang"]["type"] == "string"


def test_externals_false_pref_skips_hooks():
    # test/validator.js:288-303 — prefs.externals=false skips external rules
    import pyarrow as pa
    import joi_ray as jr
    from joi_ray import compile_schema

    calls = []

    def hook(arr):
        calls.append(len(arr))
        import numpy as np
        return np.zeros(len(arr), dtype=bool)  # would fail every row

    import tests.test_extend_modify as me
    me._ext_hook = hook
    s = jr.object({"x": jr.string().external("tests.test_extend_modify:_ext_hook")})
    t = pa.table({"x": ["a"]})
    res = compile_schema(s, prefs={"externals": False}).validate_table(t)
    assert list(res.ok) == [True] and calls == []
    res2 = compile_schema(s).validate_table(t)
    assert list(res2.ok) == [False] and calls == [1]


def test_id_extract_fork_containers():
    # modify.js:19-101 extract via ids; :447-574 fork into arrays and
    # alternatives branches; :576-592 id() asserts
    import pytest

    import joi_ray as jr

    s2 = jr.object({"a": jr.number().id("x")})
    assert s2.extract("x").type == "number"
    with pytest.raises(ValueError):
        jr.number().id("a").id("b")
    with pytest.raises(ValueError):
        jr.number().id("")

    arr = jr.object({"lst": jr.array().items(jr.number().id("it"))})
    f = arr.fork("lst.it", lambda sc: sc.max(5))
    rules = f.describe()["keys"]["lst"]["items"][0].get("rules", [])
    assert any(r["name"] == "max" for r in rules)
    assert arr.extract("lst.it").type == "number"
    # original untouched (immutability, modify.js:131-171)
    assert not any(r["name"] == "max"
                   for r in arr.describe()["keys"]["lst"]["items"][0].get("rules", []))

    alt = jr.object({"v": jr.alternatives(jr.number().id("n"), jr.string().id("s"))})
    f2 = alt.fork("v.s", lambda sc: sc.min(2))
    d = f2.describe()["keys"]["v"]["matches"][1]
    assert any(r["name"] == "min" for r in d.get("rules", []))
    # fork into a conditional when branch
    alt3 = jr.object({"v": jr.alternatives().when(
        "c", is_=1, then=jr.string().id("th"))})
    f3 = alt3.fork("v.th", lambda sc: sc.min(3))
    d3 = f3.describe()["keys"]["v"]["matches"][0]["then"]
    assert any(r["name"] == "min" for r in d3.get("rules", []))


def test_fork_moves_adjusted_key_last():
    """The reference's fork() re-appends the adjusted key via keys(), so it
    moves to the END of key order — observable through abortEarly's first
    error (node-verified, fuzz seed 14000059).  Intermediate path keys keep
    their position."""
    s = jr.object({"p": jr.number().min(5), "q": jr.string().min(3)})
    f = s.fork("p", lambda x: x.optional())
    assert list(f.terms["keys"]) == ["q", "p"]
    res = compile_schema(f, prefs={"abort_early": True}).validate_table(
        pa.table({"p": [1.0], "q": ["x"]}))
    assert [v["code"] for v in res.violations.to_pylist()] == ["string.min"]

    nested = jr.object({"p": jr.number(), "q": jr.object({"r": jr.string(), "s": jr.number()})})
    nf = nested.fork("q.r", lambda x: x.required())
    assert list(nf.terms["keys"]) == ["p", "q"]          # outer q stays put
    assert list(nf.terms["keys"]["q"].terms["keys"]) == ["s", "r"]  # leaf moves

    multi = jr.object({"a": jr.number(), "b": jr.number(), "c": jr.number()})
    mf = multi.fork(["a", "b"], lambda x: x.required())
    assert list(mf.terms["keys"]) == ["c", "a", "b"]


def test_forbidden_object_skips_children():
    """joi returns at the presence stage for a present forbidden value
    (validator.js:188-190): any.unknown is the ONLY error — children and
    array items never validate (node-verified, fuzz seed 14000246)."""
    s = jr.object({"q": jr.object({"r": jr.string().min(3)}).forbidden()})
    res = compile_schema(s, prefs={"abort_early": False}).validate_table(
        pa.table({"q": [{"r": ""}]}))
    assert [(v["path"], v["code"]) for v in res.violations.to_pylist()] == [("q", "any.unknown")]

    sa = jr.object({"q": jr.array().items(jr.number().min(5)).forbidden()})
    res = compile_schema(sa, prefs={"abort_early": False}).validate_table(
        pa.table({"q": [[1.0, 2.0]]}))
    assert [(v["path"], v["code"]) for v in res.violations.to_pylist()] == [("q", "any.unknown")]


def test_second_when_unreachable_and_concat_dead_matches():
    """v16: when() on a base fills both branches with the base itself, so
    the rewritten alternatives' first match resolves every value — a second
    when() throws 'Unreachable condition' (alternatives.js:174) and matches
    appended by concat are dead code (alternatives.js:47-57 returns at the
    first resolving entry; node-verified, fuzz seed 14000003)."""
    import pytest

    base = jr.number().min(31).when("a", is_=-1.0, then=jr.number().max(-3))
    with pytest.raises(ValueError, match="Unreachable condition"):
        base.when("a", is_=2.0, then=jr.number().min(99))

    other = jr.number().when("a", is_=-1.0, then=jr.number().valid(0.0, 5.0))
    merged = jr.object({"a": base.concat(other)})
    res = compile_schema(merged, prefs={"abort_early": False}).validate_table(
        pa.table({"a": [-1.0]}))
    codes = sorted(v["code"] for v in res.violations.to_pylist())
    # the concat'd when's valid() never fires — only the base branch errors
    # (node-verified: ['number.min', 'number.max'])
    assert codes == ["number.max", "number.min"]

    # when-bearing vs plain concat is a type mismatch in the reference
    with pytest.raises(ValueError, match="alternatives"):
        jr.number().min(1).concat(other)
