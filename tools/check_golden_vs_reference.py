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
    # the draft-bound checker registry (a bare FormatChecker() serves
    # draft-3-era checkers, e.g. strptime-based `time`)
    validator = jsonschema.Draft202012Validator(
        schema, format_checker=jsonschema.Draft202012Validator.FORMAT_CHECKER
    )
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
