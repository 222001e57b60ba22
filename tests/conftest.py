"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware via
``--xla_force_host_platform_device_count=8`` (SURVEY.md section 4 item 7:
the reference has no distributed tests; we do better).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize imports jax and registers the TPU (axon)
# backend before this conftest runs, so the env var alone is too late —
# force the platform through the live config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Per-RUN persistent compilation cache, shared across test modules and the
# subprocess-isolated tests (children inherit the env var): identical tiny
# engines are compiled once per run instead of once per module/process.
# A fresh dir per top-level run — never the TPU bench cache — so entries
# compiled for another machine's CPU features can't poison the run.
if "ESVS_TEST_JAXCACHE" not in os.environ:
    import atexit
    import shutil
    import tempfile

    os.environ["ESVS_TEST_JAXCACHE"] = tempfile.mkdtemp(
        prefix="esvs-test-jaxcache-"
    )
    # The creating (top-level) process removes the dir when the run ends
    # — a full run writes ~600 MB of kernels, which would otherwise pile
    # up in /tmp forever. Children that inherited the var skip this, and
    # they always finish before the parent's test returns.
    atexit.register(
        shutil.rmtree, os.environ["ESVS_TEST_JAXCACHE"], ignore_errors=True
    )
jax.config.update("jax_compilation_cache_dir", os.environ["ESVS_TEST_JAXCACHE"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
# Persist EVERY kernel, including the sub-0.5s eager-dispatch minis
# (threshold 0.0, not the 0.5 default-ish we shipped before): the
# per-module jax.clear_caches() below wipes thousands of cached tiny
# executables that eager `module.init` re-pays in every later module.
# With all of them on disk, each post-clear re-compile is a cache read.
# Measured (3 model-heavy modules, 1-core box): 179.5 s with 0.5s
# threshold -> 146.2 s with 0.0 — recovers the full cost of the clears
# while keeping their segfault protection.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

TEST_DATA_DIR = pathlib.Path(__file__).parent / "data"
# Bundled fixture data (NIT SONG070 labels, CC-BY 3.0 — see COPYING there).
NIT_DATA_DIR = TEST_DATA_DIR / "nit_song070"
# Read-only fixtures from the reference repo — ONLY for tests that compare
# against reference artifacts (torch checkpoints, reference YAMLs); such
# tests skip cleanly when the checkout is absent.
REFERENCE_DATA_DIR = pathlib.Path("/root/reference/tests/data")


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def reference_data_dir():
    if not REFERENCE_DATA_DIR.exists():
        pytest.skip("reference fixture data not available")
    return REFERENCE_DATA_DIR


@pytest.fixture(scope="session")
def fixture_data_dir(tmp_path_factory):
    """Self-contained stand-in for the old reference tests/data dir:
    the bundled NIT SONG070 label + a first-party synthesized wav that
    follows the label's score pitch (voiced harmonics / unvoiced noise),
    laid out as <dir>/<utt>.lab + <dir>/<utt>.wav."""
    import shutil

    from scipy.io import wavfile

    from ensemble_svs_with_interactions_tpu.io import hts

    from tests import util

    d = tmp_path_factory.mktemp("nit_fixture")
    utt = "nitech_jp_song070_f001_004"
    shutil.copyfile(util.NIT_LAB, d / f"{utt}.lab")
    binary_dict, numeric_dict = hts.load_question_set(util.HED)
    labels = hts.load(util.NIT_LAB)
    wav = util.synth_wav_from_labels(
        labels, binary_dict, numeric_dict, np.random.default_rng(0), sr=24000
    )
    wavfile.write(d / f"{utt}.wav", 24000, wav)
    return d


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound accumulated XLA-CPU compiler state.

    A single long pytest process accumulates hundreds of compiled
    executables; around ~275 tests in, the XLA CPU compiler can segfault
    inside backend_compile_and_load (known long-process failure, see
    CLAUDE.md). Dropping the in-memory executable caches after every test
    module keeps the process well inside the stable regime; modules
    recompile what they need (cross-module jit sharing was minimal)."""
    yield
    # ESVS_NO_MODULE_CLEAR=1 is a debugging/measurement knob only — the
    # clears are load-bearing for long-process XLA-CPU stability.
    if os.environ.get("ESVS_NO_MODULE_CLEAR") != "1":
        jax.clear_caches()


def pytest_collection_modifyitems(config, items):
    """`@pytest.mark.isolate`: run the test in a fresh subprocess.

    For tests whose differentiated-graph compiles are big enough to
    destabilize a long-lived XLA CPU process (the proven
    _USFGAN_LOSS_DRIVE pattern, generalized). The in-process body is
    replaced by a `pytest <nodeid>` child invocation; failures propagate
    with the child's output."""
    if os.environ.get("ESVS_IN_ISOLATION") == "1":
        return
    for item in items:
        if item.get_closest_marker("isolate"):
            item.obj = _make_isolated_runner(item.nodeid)


def _make_isolated_runner(nodeid: str):
    def run_isolated(**_fixtures):
        import subprocess
        import sys

        env = dict(os.environ, ESVS_IN_ISOLATION="1")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "--no-header", nodeid],
            cwd=str(pathlib.Path(__file__).parent.parent),
            env=env,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        if r.returncode != 0:
            raise AssertionError(
                f"isolated subprocess for {nodeid} failed "
                f"(exit {r.returncode}):\n{r.stdout}\n{r.stderr}"
            )

    return run_isolated


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "isolate: run this test in a fresh pytest subprocess "
        "(big XLA CPU compiles destabilize long processes)",
    )
