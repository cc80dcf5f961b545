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
same pair.

Round 5 adds a RANDOM differential mode: `gen_bestmatch_pins.py
[n_random] [seed]` (default 40, seed 20260819) generates random
multi-failure suites inside the engine-supported flat subset
(per-field scalar keywords, field-level anyOf/oneOf, root required,
untyped allOf property overlays), labels each with the LIVE
best_match, and keeps only cases whose reference relevance maximum is
STRICTLY unique (a tied max falls to dict-iteration order in the
reference and to constraint_id order in the engine — the documented
stand-in, not a parity claim) and whose winning error maps
mechanically onto an engine constraint id. Random pins are appended
after the authored ones in the same committed file, so
BestMatchParitySpec pins both by construction.
"""
import json
import random
import sys

import jsonschema
from jsonschema.exceptions import best_match, relevance

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


# ---- random differential mode (round 5) --------------------------------

FIELD_NAMES = ["a", "b", "m", "z", "q2", "tag"]
INT_VALS = [-10, -1, 0, 1, 2, 3, 5, 7, 10, 63, 100]
STR_VALS = ["", "a", "ab", "abc", "doc-42", "web", "0123456789", "x" * 12]
PATTERNS = ["^a", "b$", "^[0-9]+$", "^doc-[0-9]+$", "a.b", "[A-Z]"]
ARR_VALS = [[], [1], [1, 2, 3], [5, 5], [-1, 0, 1, 2], [7] * 4]


def _int_kw(rng):
    k = rng.choice(["minimum", "maximum", "exclusiveMinimum",
                    "exclusiveMaximum", "multipleOf", "enum", "const"])
    if k == "multipleOf":
        return {k: rng.choice([2, 3, 5, 7])}
    if k == "enum":
        return {k: rng.sample(INT_VALS, rng.randint(1, 3))}
    if k == "const":
        return {k: rng.choice(INT_VALS)}
    return {k: rng.choice(INT_VALS)}


def _str_kw(rng):
    k = rng.choice(["minLength", "maxLength", "pattern", "enum", "const"])
    if k in ("minLength", "maxLength"):
        return {k: rng.randint(0, 8)}
    if k == "pattern":
        return {k: rng.choice(PATTERNS)}
    if k == "enum":
        return {k: rng.sample(STR_VALS, rng.randint(1, 3))}
    return {k: rng.choice(STR_VALS)}


def _arr_kw(rng):
    k = rng.choice(["minItems", "maxItems", "uniqueItems"])
    if k == "uniqueItems":
        return {k: True}
    return {k: rng.randint(0, 4)}


def _int_gated(rng):
    # NULL-GATED only (no enum/const/type): vacuous on an absent key in
    # both the reference and the engine's null-column reinterpretation
    k = rng.choice(["minimum", "maximum", "exclusiveMinimum",
                    "exclusiveMaximum", "multipleOf"])
    return {k: rng.choice([2, 3, 5, 7])} if k == "multipleOf" else {k: rng.choice(INT_VALS)}


def _str_gated(rng):
    k = rng.choice(["minLength", "maxLength", "pattern"])
    return {k: rng.choice(PATTERNS)} if k == "pattern" else {k: rng.randint(0, 8)}


KW_MAKERS = {"int": _int_kw, "string": _str_kw, "array<int>": _arr_kw}
GATED_MAKERS = {"int": _int_gated, "string": _str_gated, "array<int>": _arr_kw}
JSON_TYPE = {"int": "integer", "string": "string", "array<int>": "array"}


def _one_random(rng, idx, seed):
    """One random candidate (suite, instance); None when it doesn't
    qualify as a deterministic adversarial pin (see module doc)."""
    nf = rng.randint(2, 3)
    fields = rng.sample(FIELD_NAMES, nf)
    ctypes = {f: rng.choice(list(KW_MAKERS)) for f in fields}
    # the required-omitted field carries ONLY null-gated keywords and no
    # type: the engine reads an absent key as a NULL column, which is
    # stricter than the reference for enum/const/type (the documented
    # row-model reinterpretation, tools/gen_fuzz_cases.py row kind) —
    # those keywords on an absent-able field are not a parity surface
    omitted = rng.choice(fields) if rng.random() < 0.35 else None
    props, schema = {}, {}
    for f in fields:
        sub = {}
        if f == omitted:
            for _ in range(rng.randint(1, 2)):
                sub.update(GATED_MAKERS[ctypes[f]](rng))
            props[f] = sub
            continue
        if rng.random() < 0.7:
            sub["type"] = JSON_TYPE[ctypes[f]]
        mk = KW_MAKERS[ctypes[f]]
        if ctypes[f] != "array<int>" and rng.random() < 0.3:
            sub[rng.choice(["anyOf", "oneOf"])] = [mk(rng) for _ in range(2)]
            if rng.random() < 0.5:
                sub.update(mk(rng))
        else:
            for _ in range(rng.randint(1, 2)):
                sub.update(mk(rng))
        props[f] = sub
    schema["properties"] = props
    if omitted is not None:
        schema["required"] = [omitted]
    if rng.random() < 0.25:  # untyped overlay scope (_matches_type arm)
        f = rng.choice([x for x in fields if x != omitted])
        schema["allOf"] = [{"properties": {f: KW_MAKERS[ctypes[f]](rng)}}]
    data = {}
    for f in fields:
        if f == omitted:
            continue
        pool = {"int": INT_VALS, "string": STR_VALS, "array<int>": ARR_VALS}[ctypes[f]]
        data[f] = rng.choice(pool)

    V = jsonschema.Draft202012Validator
    errs = list(V(schema).iter_errors(data))
    if len(errs) < 2:
        return None
    rels = sorted((relevance(e) for e in errs), reverse=True)
    if not (rels[0] > rels[1]):  # tied max: iteration-order territory, skip
        return None
    bm = best_match(errs)

    def to_engine_id(e):
        sp = list(e.absolute_schema_path)
        path = list(e.path)
        if e.validator == "required":
            missing = [p for p in e.validator_value if p not in data]
            return f"{missing[0]}.required" if len(missing) == 1 else None
        if len(path) == 1 and sp[:2] == ["properties", path[0]] and len(sp) == 3:
            return f"{path[0]}.{sp[2]}"
        if (len(path) == 1 and len(sp) == 5 and sp[0] == "allOf"
                and sp[2] == "properties" and sp[3] == path[0]):
            return f"allOf[{sp[1]}].{path[0]}.{sp[4]}"
        return None  # element-level / nested: outside the flat map

    engine_id = to_engine_id(bm)
    if engine_id is None:
        return None
    case = {
        "description": f"random[{idx}] seed={seed}: {bm.validator} at {list(bm.path) or '[]'} wins over {len(errs) - 1} other error(s)",
        "schema": schema,
        "columns": ctypes,
        "data": data,
        "ref_validator": bm.validator,
        "ref_path": list(bm.path),
        "engine_id": engine_id,
    }
    # FULL ranked-order label when every failing error maps and every
    # relevance tuple is pairwise distinct (ties fall to iteration order
    # in the reference and constraint_id order in the engine — not a
    # parity surface): the engine's whole severity-DESC ordering must
    # reproduce sorted(errors, key=relevance, reverse=True).
    all_ids = [to_engine_id(e) for e in errs]
    pairwise_distinct = all(rels[i] > rels[i + 1] for i in range(len(rels) - 1))
    if None not in all_ids and len(set(all_ids)) == len(all_ids) and pairwise_distinct:
        ordered = sorted(errs, key=relevance, reverse=True)
        case["engine_order"] = [to_engine_id(e) for e in ordered]
    return case


def random_cases(n, seed):
    rng = random.Random(seed)
    out, idx, attempts = [], 0, 0
    cap = max(2, n // 6)  # per-validator cap: keep the winner mix diverse
    counts = {}
    while len(out) < n and attempts < n * 400:
        attempts += 1
        c = _one_random(rng, idx, seed)
        if c is not None and counts.get(c["ref_validator"], 0) < cap:
            counts[c["ref_validator"]] = counts.get(c["ref_validator"], 0) + 1
            out.append(c)
            idx += 1
    if len(out) < n:
        print(f"WARNING: only {len(out)}/{n} random pins after {attempts} attempts",
              file=sys.stderr)
    return out


def main():
    n_random = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260819
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
    randoms = random_cases(n_random, seed)
    out = "src/test/resources/golden/bestmatch_pins.json"
    with open(out, "w") as fh:
        json.dump(CASES + randoms, fh, indent=1)
    print(f"{len(CASES)} authored pins live-verified + {len(randoms)} random "
          f"differential pins (seed={seed}) against jsonschema "
          f"{jsonschema.__version__} best_match -> {out}")


if __name__ == "__main__":
    main()
