"""Replay one fuzz seed and print the schema spec, the input rows, and
both engines' full per-row outputs (errors + converted values).

Usage: python tools/repro_seed.py SEED [ROW]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffref import RefJoi, build_spec_py, diff_case, rows_from_table  # noqa: E402
from fuzz_spec import gen_case  # noqa: E402


def main():
    seed = int(sys.argv[1])
    only_row = int(sys.argv[2]) if len(sys.argv) > 2 else None
    root_spec, tbl, prefs = gen_case(seed)
    print("PREFS:", prefs)
    print("SPEC:", json.dumps(root_spec, indent=1, default=str))
    ref = RefJoi()
    try:
        ref_out = ref.validate(None, rows_from_table(tbl), prefs, spec=root_spec)
        devs = diff_case(ref, build_spec_py(root_spec), tbl, prefs, spec=root_spec)
        by_row = {}
        for d in devs:
            by_row.setdefault(d.get("row"), []).append(d)
        for i, r in enumerate(ref_out):
            if only_row is not None and i != only_row:
                continue
            marker = " <-- DEV" if i in by_row else ""
            print(f"--- row {i}{marker}")
            print("  input:", json.dumps({k: str(v) for k, v in zip(tbl.column_names, [c[i] for c in tbl.columns])}))
            print("  REF errors:", json.dumps(r.get("errors"), default=str))
            print("  REF value :", json.dumps(r.get("value"), default=str)[:200])
            for d in by_row.get(i, []):
                print("  DEV", d["kind"])
                print("    ref:", json.dumps(d.get("ref"), default=str)[:400])
                print("    ray:", json.dumps(d.get("ray"), default=str)[:400])
    finally:
        ref.close()


if __name__ == "__main__":
    main()
