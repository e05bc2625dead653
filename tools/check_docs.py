"""Doc-vs-bench consistency gate (VERDICT r4 #9, made structural).

r3 and r4 both shipped README/PERF_NOTES numbers that a later commit's
bench had superseded. This check makes the drift loud: it reads the
NEWEST bench artifact (bench_r5*.json / BENCH_r*.json by mtime) and
verifies the README's quoted headline numbers against it within 15%.

Run before every snapshot:  python tools/check_docs.py
Exit 0 = consistent; 1 = README contradicts the newest bench artifact.
"""

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_bench():
    cands = [p for pat in ("bench_r*.json", "BENCH_r*.json")
             for p in glob.glob(os.path.join(ROOT, pat))]
    cands = [p for p in cands if os.path.getsize(p) > 0]
    if not cands:
        return None, None
    path = max(cands, key=os.path.getmtime)
    with open(path) as f:
        data = json.load(f)
    # Driver BENCH files may wrap the bench line under "parsed".
    if "base" not in data and isinstance(data.get("parsed"), dict):
        data = data["parsed"]
    return path, data


def main() -> int:
    path, bench = newest_bench()
    if bench is None or "base" not in bench:
        print("check_docs: no bench artifact found — nothing to check")
        return 0
    readme = open(os.path.join(ROOT, "README.md")).read()

    failures = []

    def close(quoted, actual, tol=0.15):
        return abs(quoted - actual) <= tol * max(abs(actual), 1e-12)

    m = re.search(r"\*\*base\*\*.*?\*\*([\d.]+) MP/s\*\*", readme, re.S)
    if not m:
        failures.append("README: no quoted base MP/s found")
    elif not close(float(m.group(1)), bench["base"]["mps"]):
        failures.append(
            f"README base {m.group(1)} MP/s vs bench "
            f"{bench['base']['mps']} ({os.path.basename(path)})")

    m = re.search(r"\*\*flagship `-S`\*\*.*?\*\*([\d.]+) MP/s\*\*",
                  readme, re.S)
    sf = bench.get("shading_flagship")
    if not m:
        failures.append("README: no quoted flagship MP/s found")
    elif sf and not close(float(m.group(1)), sf["mps"]):
        failures.append(
            f"README flagship {m.group(1)} MP/s vs bench {sf['mps']} "
            f"({os.path.basename(path)})")

    m = re.search(r"\*\*([\d.]+)%\s*\n?\s*coverage\*\*", readme)
    if m and not close(float(m.group(1)) / 100.0,
                       bench["base"]["coverage"], tol=0.02):
        failures.append(
            f"README base coverage {m.group(1)}% vs bench "
            f"{bench['base']['coverage']:.1%}")

    if failures:
        print("check_docs: FAIL")
        for f in failures:
            print("  - " + f)
        return 1
    print(f"check_docs: OK (README consistent with "
          f"{os.path.basename(path)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
