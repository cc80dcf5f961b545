#!/usr/bin/env python3
"""Cross-check the engine's golden parity corpus against the reference
validator itself.

The golden corpus (src/test/resources/golden/cases.json, JSON-Schema-
Test-Suite case format) is what GoldenSuiteSpec asserts the Spark engine
against. This script closes the loop on the other side: every case's
`valid` flag is re-derived by running the actual spec-conformant
validator present on this machine (jsonschema 4.26.0, draft 2020-12 —
the SURVEY.md §0 stand-in for json-schema-go, identical by construction
to any conformant implementation). If this passes AND GoldenSuiteSpec
passes, then engine verdicts == reference verdicts, case by case.

Engine-keyword cases (ctype 'engine:*', e.g. cross-field EqSizeOf) have
no JSON Schema analogue and are skipped with a note.

Usage: check_golden_vs_reference.py [cases.json]
Exit 0 iff every JSON-Schema-expressible case matches the reference.
"""
import json
import sys

import jsonschema

path = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/golden/cases.json"
cases = json.load(open(path))

mismatches = []
checked = skipped = 0
for group in cases:
    schema = group["schema"]
    ctype = group.get("ctype", "")
    if ctype.startswith("engine:"):
        skipped += len(group["tests"])
        continue
    # dialect-aware: $schema picks the validator class exactly like the
    # reference's validator_for (PJS:validators.py:1335-1410) — legacy
    # golden groups (draft-4/7 items-array, dependencies, boolean
    # exclusive bounds, $ref-overrides-siblings) run under their own
    # draft's validator. The checker registry stays draft-bound (a bare
    # FormatChecker() would serve draft-3-era checkers, e.g.
    # strptime-based `time`).
    cls = jsonschema.validators.validator_for(
        schema, default=jsonschema.Draft202012Validator
    )
    if group.get("resources"):
        # multi-resource $id registry groups: the reference resolves
        # absolute $refs against a referencing.Registry (REF:_core.py:
        # 653-698) — build it from the group's resource documents
        from referencing import Registry, Resource
        from referencing.jsonschema import DRAFT202012

        regs = [
            Resource.from_contents(r, default_specification=DRAFT202012)
            for r in group["resources"]
        ]
        registry = Registry().with_resources((r.id(), r) for r in regs)
        validator = cls(schema, registry=registry, format_checker=cls.FORMAT_CHECKER)
    else:
        validator = cls(schema, format_checker=cls.FORMAT_CHECKER)
    for t in group["tests"]:
        checked += 1
        ref_valid = validator.is_valid(t["data"])
        if ref_valid != t["valid"]:
            mismatches.append(
                f"{group['description']} / {t['description']}: "
                f"corpus says valid={t['valid']}, reference says {ref_valid}"
            )

for m in mismatches:
    print("MISMATCH", m)
print(f"{checked} checked against reference, {skipped} engine-only skipped, "
      f"{len(mismatches)} mismatches")
sys.exit(1 if mismatches else 0)
