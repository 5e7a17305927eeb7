"""Package the engine for cluster submission (north_rule: "runs via
spark-submit --py-files").

Builds dist/lsh_forest_for_multi_vector_retrieval_spark.zip containing the
package (source only, no tests/artifacts) so a driver script can be
submitted as:

    python tools/make_pyfiles.py
    spark-submit \
      --master yarn --deploy-mode cluster \
      --py-files dist/lsh_forest_for_multi_vector_retrieval_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.shuffle.partitions=<~2-3x total cores> \
      your_job.py

The zip is importable directly off PYTHONPATH (Spark adds --py-files to
every executor's sys.path), verified here by importing from it in a
subprocess.
"""

from __future__ import annotations

import subprocess
import sys
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = "lsh_forest_for_multi_vector_retrieval_spark"


def build(out_dir: Path | None = None) -> Path:
    out_dir = out_dir or ROOT / "dist"
    out_dir.mkdir(exist_ok=True)
    out = out_dir / f"{PKG}.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((ROOT / PKG).rglob("*.py")):
            if "__pycache__" in py.parts:
                continue
            zf.write(py, py.relative_to(ROOT))
    return out


def verify(zip_path: Path) -> None:
    """Import the package from the zip alone — what executors will do."""
    code = (
        f"import sys; sys.path.insert(0, {str(zip_path)!r}); "
        f"import {PKG}.config as c; import {PKG}.operators.dedup; "
        f"print(c.DedupConfig().num_perm)"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd="/tmp"
    )
    if res.returncode != 0 or res.stdout.strip() != "128":
        raise RuntimeError(f"zip import check failed: {res.stderr}")


if __name__ == "__main__":
    p = build()
    verify(p)
    print(f"ok: {p} ({p.stat().st_size} bytes), importable from zip")
