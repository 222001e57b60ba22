"""Template-variable construction for flax modules.

Checkpoint deserialization (`flax.serialization.from_bytes`) and torch
weight porting both need a variable tree whose *structure* matches the
saved one; the values are throwaway.  `init_template` builds that tree by
dispatching on the module's ``__call__`` signature:

- multitrack acoustic  — ``(x_main, x_sub, (spk, spk), lengths, ys)``
- multitrack timing    — ``(concat(x_main, x_sub), (spk, spk), lengths)``
- speaker-conditioned  — ``(x, spks, lengths)``
- diffusion (``cond``) — ``(x, lengths, y)`` through the training path so
  the K-step sampling loop is not traced at template-build time
- plain                — ``(x, lengths)``

Shared by ``svs._load_variables`` (pack loading) and
``bin/enunu2nnsvs.try_port_phase`` (torch->flax porting); the reference
builds the same templates implicitly by constructing torch modules
(reference nnsvs/svs.py:122-241, nnsvs/model.py:1246-1247).
"""

from __future__ import annotations


def init_template(module, in_dim, out_dim=None, T: int = 8):
    """Return ``module.init(...)`` variables with batch 1 and ``T`` frames.

    ``out_dim=None`` keeps the historical fallbacks: 1 for the multitrack
    acoustic target streams, ``in_dim`` for the diffusion target.
    """
    import inspect

    import jax
    import jax.numpy as jnp

    in_dim = int(in_dim)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "prenet": jax.random.PRNGKey(2),
        "zoneout": jax.random.PRNGKey(3),
        "diffusion": jax.random.PRNGKey(4),
    }
    lengths = jnp.asarray([T])
    sig = list(inspect.signature(module.__call__).parameters)

    if "x_main" in sig:  # multitrack acoustic (cascades / multistream)
        od = 1 if out_dim is None else int(out_dim)
        spks = (jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
        ys = (
            jnp.zeros((1, T, od), jnp.float32),
            jnp.zeros((1, T, od), jnp.float32),
        )
        return module.init(
            rngs,
            jnp.zeros((1, T, in_dim), jnp.float32),
            jnp.zeros((1, T, in_dim), jnp.float32),
            spks,
            lengths,
            ys,
            train=True,
        )
    if "spks" in sig and type(module).__name__.startswith("MultiTrack"):
        # multitrack timing: x = concat(x_main, x_sub) -> 2*in_dim features,
        # spks is a (main, sub) tuple (reference model.py:1246-1247)
        spks = (jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
        return module.init(
            rngs,
            jnp.zeros((1, T, 2 * in_dim), jnp.float32),
            spks,
            lengths,
            train=True,
        )
    if "spks" in sig:
        args = [
            jnp.zeros((1, T, in_dim), jnp.float32),
            jnp.zeros((1,), jnp.int32),
            lengths,
        ]
        if "cond" in sig:
            # speaker-conditioned diffusion: the training path requires the
            # diffusion target y (x0 = y / norm_scale)
            y_dim = in_dim if out_dim is None else int(out_dim)
            args.append(jnp.zeros((1, T, y_dim), jnp.float32))
        return module.init(rngs, *args, train=True)
    if "cond" in sig:  # diffusion: init via the training path (y given)
        y_dim = in_dim if out_dim is None else int(out_dim)
        return module.init(
            rngs,
            jnp.zeros((1, T, in_dim), jnp.float32),
            lengths,
            jnp.zeros((1, T, y_dim), jnp.float32),
            train=True,
        )
    return module.init(
        rngs, jnp.zeros((1, T, in_dim), jnp.float32), lengths, train=True
    )
