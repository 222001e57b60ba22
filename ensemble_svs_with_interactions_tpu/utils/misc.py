"""Miscellaneous utilities: masks, padding, stream info, imports, seeding.

Parity targets: /root/reference/nnsvs/util.py:70 (get_world_stream_info),
:113 (load_utt_list), :144 (init_seed), :157 (dynamic_import), :171 (pad_2d),
:191/:235 (make_(non_)pad_mask).  Masks here are JAX arrays shaped (B, T)
(optionally broadcast by the caller) — packed sequences do not exist in XLA,
so masks are the universal variable-length mechanism in this framework.
"""

from __future__ import annotations

import importlib
import random
from typing import Any, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np


def get_world_num_aperiodicities(sr: int) -> int:
    """Number of WORLD band aperiodicities for a sampling rate.

    First-party equivalent of pyworld.get_num_aperiodicities: bands are
    3 kHz wide, capped at 15 kHz (WORLD's kFrequencyInterval/kUpperLimit).
    48 kHz -> 5 bands.
    """
    return int(min(15000.0, sr / 2.0 - 3000.0) / 3000.0)


def get_world_stream_info(
    sr: int,
    mgc_order: int,
    num_windows: int = 3,
    vibrato_mode: str = "none",
    use_mcep_aperiodicity: bool = False,
    mcep_aperiodicity_order: int = 24,
) -> List[int]:
    """Stream sizes for WORLD acoustic features [mgc, lf0, vuv, bap, (vib)]."""
    stream_sizes = [
        (mgc_order + 1) * num_windows,
        num_windows,
        1,
        (
            get_world_num_aperiodicities(sr) * num_windows
            if not use_mcep_aperiodicity
            else mcep_aperiodicity_order + 1
        ),
    ]
    if vibrato_mode == "diff":
        stream_sizes.append(num_windows)
    elif vibrato_mode == "sine":
        stream_sizes.append(3 * num_windows)
        stream_sizes.append(1)
    elif vibrato_mode != "none":
        raise RuntimeError(f"unknown vibrato mode: {vibrato_mode}")
    return stream_sizes


def load_utt_list(utt_list_path) -> List[str]:
    with open(utt_list_path) as f:
        utt_ids = [line.strip() for line in f]
    return [u for u in utt_ids if u]


def init_seed(seed: int) -> None:
    """Seed host-side RNGs (JAX randomness is key-threaded, not global)."""
    random.seed(seed)
    np.random.seed(seed)


def dynamic_import(name: str) -> Any:
    """Import ``module.path:ClassName`` or ``module.path.ClassName``."""
    if ":" in name:
        mod_name, cls_name = name.split(":")
    else:
        mod_name, _, cls_name = name.rpartition(".")
    mod = importlib.import_module(mod_name)
    return getattr(mod, cls_name)


def pad_2d(x: np.ndarray, max_len: int, constant_values=0) -> np.ndarray:
    """Pad a (T, D) array to (max_len, D)."""
    return np.pad(
        x,
        [(0, max_len - len(x)), (0, 0)],
        mode="constant",
        constant_values=constant_values,
    )


def make_pad_mask(lengths, maxlen: Optional[int] = None):
    """(B, T) bool mask, True at padded positions."""
    lengths = jnp.asarray(lengths)
    if maxlen is None:
        maxlen = int(jnp.max(lengths))
    steps = jnp.arange(maxlen)[None, :]
    return steps >= lengths[:, None]


def make_non_pad_mask(lengths, maxlen: Optional[int] = None):
    """(B, T) bool mask, True at valid (non-padded) positions."""
    return ~make_pad_mask(lengths, maxlen)


def lengths_to_weights(lengths, maxlen: Optional[int] = None, dtype=jnp.float32):
    """(B, T, 1) float mask for loss weighting."""
    return make_non_pad_mask(lengths, maxlen).astype(dtype)[:, :, None]


def example_xml_file() -> str:
    """Path to the packaged first-party example MusicXML score
    (reference nnsvs/util.py example_xml_file + nnsvs/_example_data/)."""
    from pathlib import Path

    return str(
        Path(__file__).parent.parent
        / "_example_data"
        / "example_song.musicxml"
    )


def example_ust_file() -> str:
    """Path to the packaged first-party example UST score (the same
    six-note phrase as :func:`example_xml_file`, in UTAU format)."""
    from pathlib import Path

    return str(
        Path(__file__).parent.parent / "_example_data" / "example_song.ust"
    )


def packaged_question_path(name: str = "jp_dev_latest") -> str:
    """Path to a question set (.hed) bundled with the package.

    The reference ships its question sets as in-tree data under
    recipes/_common/hed/ (reference recipes/_common/hed/jp_dev_latest.hed);
    this framework bundles the same data file (with a provenance header)
    so recipes and users need no external checkout."""
    from pathlib import Path

    p = (
        Path(__file__).parent.parent
        / "recipes"
        / "_common"
        / "hed"
        / f"{name}.hed"
    )
    if not p.exists():
        raise FileNotFoundError(f"no packaged question set named {name!r}: {p}")
    return str(p)
