"""Adversarial engine edge cases: interactions between stages of the
per-column chain (empty x required x default, allow x coerce-failure,
strip inside items, all-null columns, zero-width batches, deep nesting)."""

import pyarrow as pa

import joi_ray as jr
from joi_ray import compile_schema, object as obj


def V(schema_root, tbl, prefs=None):
    return compile_schema(schema_root, prefs={"abort_early": False, **(prefs or {})}).validate_table(tbl)


def test_empty_then_default_then_required_order():
    # empty('') -> missing; default fills; required not violated when default exists?
    # joi: required + empty('') -> '' becomes undefined -> any.required fires
    res = V(obj({"x": jr.string().empty("").required()}), pa.table({"x": ["", "v"]}))
    assert list(res.ok) == [False, True]
    # optional + empty + default: '' -> default
    res = V(obj({"x": jr.string().empty("").default("d")}), pa.table({"x": ["", "v"]}))
    assert res.value["x"].to_pylist() == ["d", "v"]


def test_allow_value_that_fails_coercion():
    # 'N/A' is not a number but is explicitly allowed -> passes, others coerce
    res = V(obj({"x": jr.number().allow("N/A")}), pa.table({"x": ["5", "N/A", "junk"]}))
    assert list(res.ok) == [True, True, False]


def test_strip_inside_struct():
    st = pa.struct([("keep", pa.int64()), ("drop", pa.string())])
    t = pa.table({"o": pa.array([{"keep": 1, "drop": "x"}], type=st)})
    res = V(obj({"o": jr.object({"keep": jr.number(), "drop": jr.string().strip()})}), t)
    assert [f.name for f in res.value["o"].type] == ["keep"]


def test_all_null_and_zero_row_columns():
    res = V(obj({"x": jr.string().min(2)}), pa.table({"x": pa.array([None, None], pa.string())}))
    assert list(res.ok) == [True, True]
    res = V(obj({"x": jr.number().required()}), pa.table({"x": pa.array([], pa.float64())}))
    assert res.n_rows == 0 and res.violations.num_rows == 0


def test_deep_nesting_list_struct_list():
    inner = pa.list_(pa.int64())
    st = pa.struct([("vals", inner)])
    outer = pa.list_(st)
    t = pa.table(
        {
            "x": pa.array(
                [[{"vals": [1, 2]}, {"vals": [-1]}], [{"vals": []}]],
                type=outer,
            )
        }
    )
    schema = jr.array().items(jr.object({"vals": jr.array().items(jr.number().min(0)).min(1)}))
    res = V(obj({"x": schema}), t)
    assert list(res.ok) == [False, False]
    codes = {v["code"] for v in res.violations.to_pylist()}
    assert {"number.min", "array.min"} <= codes


def test_only_with_ref_values():
    t = pa.table({"expected": ["a", "b"], "x": ["a", "c"]})
    res = V(obj({"expected": jr.string(), "x": jr.string().valid(jr.ref("expected"))}), t)
    assert list(res.ok) == [True, False]


def test_failover_after_item_errors():
    # failover on the array column replaces rows whose items failed
    t = pa.table({"x": pa.array([[1, -5], [2]], type=pa.list_(pa.int64()))})
    res = V(obj({"x": jr.array().items(jr.number().min(0))}), t)
    assert list(res.ok) == [False, True]


def test_duplicate_column_chain_and_concat_of_same_rule():
    # concat appending a second min(): both evaluated (multi via concat)
    s = jr.string().min(2).concat(jr.string().min(4))
    res = V(obj({"x": s}), pa.table({"x": ["abc"]}))
    assert list(res.ok) == [False]  # fails the stricter concat-added min


def test_unknown_pref_vs_flag_priority():
    t = pa.table({"x": [1.0], "extra": ["?"]})
    # flag unknown(True) wins over prefs allow_unknown False
    res = V(obj({"x": jr.number()}).unknown(), t)
    assert list(res.ok) == [True]


def test_forbidden_with_default_fills():
    res = V(obj({"x": jr.string().forbidden().default("d")}), pa.table({"x": pa.array([None], pa.string())}))
    # joi's finalize applies the default whenever the value is undefined,
    # regardless of presence (validator.js:383-386) — verified against the
    # reference: Joi.string().forbidden().default('d').validate(undefined)
    # returns {value: 'd'} with no error
    assert res.value["x"].to_pylist() == ["d"]
    assert list(res.ok) == [True]


def test_dictionary_large_string_chunked_inputs():
    d = pa.array(["en", "fr", "en", "xx"]).dictionary_encode()
    res = V(obj({"x": jr.string().valid("en", "fr")}), pa.table({"x": d}))
    assert list(res.ok) == [True, True, True, False]
    ls = pa.array(["abc", "d"], type=pa.large_string())
    assert list(V(obj({"x": jr.string().min(2)}), pa.table({"x": ls})).ok) == [True, False]
    ch = pa.chunked_array([pa.array(["aa"]), pa.array(["b"])])
    assert list(V(obj({"x": jr.string().min(2)}), pa.table({"x": ch})).ok) == [True, False]


def test_wrong_typed_column_clean_base_errors():
    """A schema applied to a column of the wrong physical type must emit
    clean {type}.base violations, never crash a typed kernel (regression:
    string pattern rules used to hit Arrow's regex kernel with int64)."""
    import joi_ray as jr
    from joi_ray import compile_schema

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "n": pa.array(["x", "y", "z"], pa.string()),  # number schema, no convert
    })
    schema = jr.object({
        "doc_id": jr.string().required().pattern(r"^doc-").min(4),
        "n": jr.number().min(5),
    })
    res = compile_schema(schema, prefs={"abort_early": False, "convert": False}).validate_table(t)
    assert not any(res.ok)
    df = res.violations.to_pandas()
    codes = set(df["code"])
    assert codes == {"string.base", "number.base"}
    assert (df.groupby("row").size() == 2).all()  # one base error per column
