"""Capture ``.explain("formatted")`` for named registry queries.

Usage: python tools/capture_plan.py <suffix> q_a q_b ...
Writes plans/r12/<query>_<suffix>.txt for each query (suffix is
``before`` or ``after``). The plan is taken on the DataFrame the query
returns — for queries that materialize through side actions (ledger
writes, streaming drains) this is the post-materialization read, same
as PLANS.md records.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_api_automate_etl_spark.queries import REGISTRY, _load_extensions

_load_extensions()
from weather_api_automate_etl_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture-plan")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, SF)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
