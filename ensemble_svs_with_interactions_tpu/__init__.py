"""TPU-native ensemble singing voice synthesis framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
sarulab-speech/ensemble_svs_with_interactions (an NNSVS fork for multi-track
ensemble SVS with inter-singer interactions, arXiv:2409.09988).

Pipeline: HTS full-context musical-score labels -> time-lag model -> duration
model -> acoustic model (WORLD params: mgc/lf0/vuv/bap or mel/lf0/vuv) ->
vocoder (WORLD synthesis kernel on TPU, or neural vocoders).

Design stance (see SURVEY.md section 7):
  * host-side NumPy score frontend (labels are data-dependent control flow),
  * jit-compiled model zoo built on flax.linen with ``lax.scan`` recurrence,
  * masks + static shape buckets instead of packed sequences,
  * MLPG / MDN / WORLD-synthesis as jitted TPU kernels,
  * ``jax.sharding.Mesh`` + ``shard_map``/pjit data-parallel training.
"""

__version__ = "0.1.0"
