#!/usr/bin/env python3
"""Generate golden/bestmatch_pins.json — best-violation parity pins.

Each case is an adversarial (suite document, instance) pair with AT
LEAST two failing constraints, where the reference's best_match pick
exercises one component of the relevance tuple
(jsonschema/exceptions.py:415-423):

    (-len(path), path, validator not in weak, validator in strong,
     not error._matches_type())

The authored `ref_validator`/`ref_path`/`engine_id` fields are
VERIFIED LIVE against jsonschema's best_match here (the script fails
loudly on any disagreement), then committed; BestMatchParitySpec
asserts the engine's severity-ranked pick equals `engine_id` for the
same pair. Run:   python3 tools/gen_bestmatch_pins.py
"""
import json
import sys

import jsonschema
from jsonschema.exceptions import best_match

CASES = [
    {
        "description": "depth dominance: required (path []) beats a typed field keyword (path ['a'])",
        "schema": {"type": "object", "required": ["z"],
                   "properties": {"a": {"type": "string", "minLength": 9},
                                  "z": {"type": "integer"}}},
        "columns": {"a": "string", "z": "int"},
        "data": {"a": "x"},
        "ref_validator": "required", "ref_path": [],
        "engine_id": "z.required",
    },
    {
        "description": "path ordering: the lexicographically larger sibling path wins at equal depth/class",
        "schema": {"properties": {"a": {"type": "string", "minLength": 5},
                                  "b": {"type": "string", "minLength": 5}}},
        "columns": {"a": "string", "b": "string"},
        "data": {"a": "x", "b": "y"},
        "ref_validator": "minLength", "ref_path": ["b"],
        "engine_id": "b.minLength",
    },
    {
        "description": "path ordering fires BEFORE weak demotion: anyOf on 'z' beats minimum on 'a'",
        "schema": {"properties": {"a": {"type": "integer", "minimum": 10},
                                  "z": {"anyOf": [{"minimum": 50}, {"multipleOf": 7}]}}},
        "columns": {"a": "int", "z": "int"},
        "data": {"a": 3, "z": 4},
        "ref_validator": "anyOf", "ref_path": ["z"],
        "engine_id": "z.anyOf",
    },
    {
        "description": "weak demotion at an EQUAL path: maximum beats sibling anyOf on the same field",
        "schema": {"properties": {"a": {"type": "integer", "maximum": 2,
                                        "anyOf": [{"minimum": 50}, {"multipleOf": 7}]}}},
        "columns": {"a": "int"},
        "data": {"a": 3},
        "ref_validator": "maximum", "ref_path": ["a"],
        "engine_id": "a.maximum",
    },
    {
        "description": "_matches_type tie-break: an untyped allOf scope's keyword outranks the typed property scope's, same path",
        "schema": {"properties": {"a": {"type": "integer", "minimum": 10}},
                   "allOf": [{"properties": {"a": {"multipleOf": 7}}}]},
        "columns": {"a": "int"},
        "data": {"a": 3},
        "ref_validator": "multipleOf", "ref_path": ["a"],
        "engine_id": "allOf[0].a.multipleOf",
    },
    {
        "description": "path ordering beats the type error's _matches_type bonus: minLength on 'b' over type-on-null at 'a'",
        "schema": {"properties": {"a": {"type": "string"},
                                  "b": {"type": "string", "minLength": 5}}},
        "columns": {"a": "string", "b": "string"},
        "data": {"a": None, "b": "y"},
        "ref_validator": "minLength", "ref_path": ["b"],
        "engine_id": "b.minLength",
    },
    {
        "description": "same shape, field renamed: the type error on 'z' now wins on path alone",
        "schema": {"properties": {"z": {"type": "string"},
                                  "b": {"type": "string", "minLength": 5}}},
        "columns": {"z": "string", "b": "string"},
        "data": {"z": None, "b": "y"},
        "ref_validator": "type", "ref_path": ["z"],
        "engine_id": "z.type",
    },
    {
        "description": "depth dominates path: a field-level error on 'a' beats an element-level one on 'zz'",
        "schema": {"properties": {"zz": {"type": "array", "items": {"minimum": 0}},
                                  "a": {"type": "integer", "minimum": 10}}},
        "columns": {"zz": "array<int>", "a": "int"},
        "data": {"zz": [-1], "a": 3},
        "ref_validator": "minimum", "ref_path": ["a"],
        "engine_id": "a.minimum",
    },
]


def main():
    V = jsonschema.Draft202012Validator
    failures = []
    for case in CASES:
        errs = list(V(case["schema"]).iter_errors(case["data"]))
        if len(errs) < 2:
            failures.append(f"{case['description']}: only {len(errs)} reference errors "
                            f"({[e.validator for e in errs]}) — not adversarial")
            continue
        bm = best_match(errs)
        got = (bm.validator, list(bm.path))
        want = (case["ref_validator"], case["ref_path"])
        if got != want:
            failures.append(f"{case['description']}: best_match={got}, authored={want}\n"
                            f"    all: {[(e.validator, list(e.path)) for e in errs]}")
    if failures:
        print("LIVE REFERENCE DISAGREES WITH AUTHORED PINS:", file=sys.stderr)
        for f in failures:
            print("  " + f, file=sys.stderr)
        sys.exit(1)
    out = "src/test/resources/golden/bestmatch_pins.json"
    with open(out, "w") as fh:
        json.dump(CASES, fh, indent=1)
    print(f"{len(CASES)} pins live-verified against jsonschema "
          f"{jsonschema.__version__} best_match -> {out}")


if __name__ == "__main__":
    main()
