#!/usr/bin/env python
"""Build the wheel in a scratch dir and assert the data files are inside.

The package is only self-contained if the wheel carries the shipped
configs, the packaged recipe (including the bundled question set), the
example scores, and the native C++ kernel source (compiled on demand at
import time).  A stale committed ``build/lib`` tree once let deleted
modules linger in wheels, so this builds from a *temp* build dir and
checks the manifest explicitly.

Usage: python tools/check_wheel_contents.py  (exits nonzero on any miss)
"""
import fnmatch
import subprocess
import sys
import tempfile
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# One representative per package-data family in pyproject.toml, plus a
# canary that must NOT be present (wheels must not ship tests or bench).
REQUIRED = [
    "ensemble_svs_with_interactions_tpu/_example_data/*.musicxml",
    "ensemble_svs_with_interactions_tpu/_example_data/*.ust",
    "ensemble_svs_with_interactions_tpu/configs/*/*.yaml",
    "ensemble_svs_with_interactions_tpu/recipes/jaCappella_dev_48k_world_multitrack/config.yaml",
    "ensemble_svs_with_interactions_tpu/recipes/_common/hed/jp_dev_latest.hed",
    "ensemble_svs_with_interactions_tpu/native/world_kernels.cpp",
    "ensemble_svs_with_interactions_tpu/models/acoustic/multistream.py",
]
FORBIDDEN = ["tests/*", "bench.py", "build/*", "*/__pycache__/*"]


def main() -> int:
    with tempfile.TemporaryDirectory() as tmp:
        subprocess.run(
            [sys.executable, "-m", "pip", "wheel", "--no-deps",
             "--no-build-isolation", "-w", tmp, str(REPO)],
            check=True,
            cwd=tmp,  # keep setuptools' build/ out of the repo tree
            capture_output=True,
            text=True,
        )
        wheels = list(Path(tmp).glob("*.whl"))
        assert len(wheels) == 1, f"expected one wheel, got {wheels}"
        names = zipfile.ZipFile(wheels[0]).namelist()

    ok = True
    for pat in REQUIRED:
        hits = fnmatch.filter(names, pat)
        status = f"ok ({len(hits)} files)" if hits else "MISSING"
        ok &= bool(hits)
        print(f"  {pat}: {status}")
    for pat in FORBIDDEN:
        hits = fnmatch.filter(names, pat)
        if hits:
            print(f"  forbidden {pat}: {len(hits)} files PRESENT")
            ok = False
    print("wheel contents:", "OK" if ok else "FAIL", f"({len(names)} entries)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
