"""Regenerate QUERIES.md — the audit index of every registered query."""
import sys
sys.path.insert(0, '.')
from data_engineering_etl_demo_spark.plans import all_specs

specs = all_specs()
by_module = {}
for name, spec in specs.items():
    by_module.setdefault(spec.module, []).append(spec)

TITLES = {
    "analytics": "Reference analytics (EP1/EP2 parity)",
    "warehouse_analytics": "Warehouse analytics (EP2 SQL parity)",
    "ecommerce": "E-commerce loader (EP3 parity)",
    "tpch": "Relational / TPC-H shapes",
    "timeseries": "Time series & data quality",
    "scale_patterns": "Scale patterns (skew, sketches, SCD2, layout)",
    "llmdata": "LLM training-data pipeline",
    "multimodal": "Multimodal (binary payload) pipeline",
    "streaming_plans": "Structured Streaming",
}

out = ["# QUERIES — registered query index (auto-generated)\n"]
out.append(f"{len(specs)} queries; every one carries a DuckDB oracle "
           "(hash-compared by the driver at sf0.01; swept locally at "
           "sf0.1 too).  Regenerate with "
           "`python scripts_gen_queries_md.py > QUERIES.md`.\n")
order = ["analytics", "warehouse_analytics", "ecommerce", "tpch",
         "timeseries", "scale_patterns", "llmdata", "multimodal",
         "streaming_plans"]
for mod in order + [m for m in sorted(by_module) if m not in order]:
    if mod not in by_module:
        continue
    rows = by_module[mod]
    out.append(f"\n## {TITLES.get(mod, mod)} ({len(rows)})\n")
    for spec in sorted(rows, key=lambda s: s.name):
        doc = " ".join((spec.doc or "").split())
        out.append(f"- **`{spec.name}`** — {doc}")
print("\n".join(out))
