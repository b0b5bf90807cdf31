#!/usr/bin/env python3
"""Regenerate SURVEY.md section 8.1: one row per registered query.

Scans the query-registration maps ("qNN_name" -> (fn _)) across
src/main/scala/graft, resolves each builder to its `def` line, assigns a
family from the defining file, and lists dedicated test suites that
mention the query (by registered name or builder name). Prints the
markdown table to stdout; the caller splices it into SURVEY.md.
"""
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SRC = ROOT / "src/main/scala/graft"
TST = ROOT / "src/test/scala"

FAMILY = {
    "RelationalQueries.scala": "relational",
    "DedupQueries.scala": "dedup",
    "SimilarityQueries.scala": "similarity",
    "TextAnalysisQueries.scala": "text",
    "EtlQueries.scala": "etl",
    "StreamingQueries.scala": "streaming",
    "CorpusQueries.scala": "corpus-stats",
    "CorpusPipeline.scala": "corpus-pipeline",
    "AnalyticsQueries.scala": "analytics",
    "TemporalQueries.scala": "temporal",
    "SegmentationQueries.scala": "segmentation",
    "ProjectionQueries.scala": "projection",
    "QualityFilterQueries.scala": "quality-filter",
}

ENTRY = re.compile(r'"(q\d+[a-z0-9_]*)"\s*->\s*\(([A-Za-z0-9]+)\s+_\)')

def main():
    sources = {p: p.read_text() for p in sorted(SRC.rglob("*.scala"))}
    tests = {p: p.read_text() for p in sorted(TST.rglob("*Spec.scala"))}
    universal = {"QueriesSmokeSpec", "StragglerGuardSpec", "PlanShapeSpec"}

    rows = {}
    for path, text in sources.items():
        for m in ENTRY.finditer(text):
            name, fn = m.group(1), m.group(2)
            if name in rows:
                continue
            # resolve the def line (same file first, then anywhere)
            loc = None
            for p2 in [path] + [p for p in sources if p != path]:
                dm = re.search(rf"\bdef {re.escape(fn)}\b", sources[p2])
                if dm:
                    line = sources[p2][: dm.start()].count("\n") + 1
                    loc = (p2, line)
                    break
            if loc is None:
                loc = (path, text[: m.start()].count("\n") + 1)
            rel = loc[0].relative_to(SRC)
            fam = FAMILY.get(loc[0].name, "other")
            specs = sorted(
                p.stem
                for p, t in tests.items()
                if p.stem not in universal and (name in t or re.search(rf"\b{fn}\b", t))
            )
            # StragglerGuardSpec/PlanShapeSpec sweep every query; a spec
            # that names the query specifically still counts as dedicated
            for p, t in tests.items():
                if p.stem in {"StragglerGuardSpec", "PlanShapeSpec"} and name in t:
                    specs.append(p.stem)
            specs = sorted(set(specs))
            rows[name] = (f"{rel}:{loc[1]}", fam, specs)

    def key(n):
        return (int(re.match(r"q(\d+)", n).group(1)), n)

    print("| query | defined at | family | dedicated specs |")
    print("|---|---|---|---|")
    for name in sorted(rows, key=key):
        loc, fam, specs = rows[name]
        spec_s = ", ".join(specs) if specs else "(oracle+smoke)"
        print(f"| {name} | {loc} | {fam} | {spec_s} |")
    print(f"\nTOTAL {len(rows)}", file=sys.stderr)

if __name__ == "__main__":
    main()
