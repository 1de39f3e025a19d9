"""spark-submit packaging + the cluster job entry point.

North rule: "runs via spark-submit --py-files on multi-executor clusters".
`build_pyfiles_zip()` packages the library; `jobs/run_pipeline_job.py` (repo
root) is the submittable driver script:

    python -m logparse_rs_spark.plans.submit --package dist/logparse_rs_spark.zip
    spark-submit --py-files dist/logparse_rs_spark.zip \
        jobs/run_pipeline_job.py --pages <path> --out <root> \
        --schema schemas/schema.json --anon configs/anonymizer.sample.json
"""

from __future__ import annotations

import argparse
import os
import zipfile


def build_pyfiles_zip(out_path: str) -> str:
    """Zip the logparse_rs_spark package for --py-files distribution."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo_root = os.path.dirname(pkg_root)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, repo_root))
    return out_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--package", default="dist/logparse_rs_spark.zip")
    args = ap.parse_args()
    path = build_pyfiles_zip(args.package)
    print(path)


if __name__ == "__main__":
    main()
