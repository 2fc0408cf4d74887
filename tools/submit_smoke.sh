#!/usr/bin/env bash
# spark-submit --py-files packaging smoke (north_rule packaging leg):
# builds the zip, synthesizes a tiny pages table OUTSIDE the repo,
# and runs the full config-driven pipeline with the engine shipped
# ONLY via the zip artifact. Verified round 2:
#   {"stages": {"sentences": 392, "mentions": 668, "frequency": 18,
#               "linked": 607, "edges": 85, "nodes": 12}} + chart SVG.
set -euo pipefail
repo="$(cd "$(dirname "$0")/.." && pwd)"
work="${1:-/tmp/submit_smoke}"
rm -rf "$work" && mkdir -p "$work"
bash "$repo/tools/package.sh" "$work" >/dev/null
printf 'from easyner_spark.cli import main\nmain()\n' > "$work/run_job.py"
PYTHONPATH="$repo" python - "$work" <<'PY'
import json, sys
from easyner_spark.session import get_spark
from easyner_spark.fixtures import generate
work = sys.argv[1]
spark = get_spark("prep", cores=4, extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
fx = generate(n_docs=60, seed=42, with_gold=False)
spark.createDataFrame(fx.pages).write.mode("overwrite").parquet(f"{work}/pages.parquet")
spark.stop()
json.dump({"input": {"pages_path": f"{work}/pages.parquet"},
           "output_dir": f"{work}/out", "modules": {"chart": True}},
          open(f"{work}/job.json", "w"))
PY
cd "$work"
spark-submit --master 'local[4]' --py-files easyner_spark.zip \
  run_job.py --config job.json 2>/dev/null | tail -1
test -s out/top_entities.svg && echo "chart: ok"

# query-mode leg: the same zip serves the consumer BGP surface over
# the edges the pipeline just materialized
python - "$work" <<'PY'
import json, sys
work = sys.argv[1]
json.dump({"output_dir": f"{work}/out",
           "queries": [{"name": "smoke",
                        "patterns": [["?x", "co_occurs_with", "?y"]],
                        "group_by": ["x"], "limit": 5}]},
          open(f"{work}/query.json", "w"))
PY
spark-submit --master 'local[4]' --py-files easyner_spark.zip \
  run_job.py --config query.json --mode query 2>/dev/null | tail -1
test -s out/query_smoke && echo "query: ok"
