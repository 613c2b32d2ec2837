"""Collective-set audit of the sharded train step (SURVEY §2.8).

tests/test_train_step.py pins sharded-vs-single *numerics*; this file pins
the compiled *graph*: over a data-parallel mesh the step's HLO must contain
only the intended collectives —

  - all-reduce: gradient sync + the scalar cross-replica reductions inside
    minibatch-stddev and the GP/metric means (SURVEY §2.8 psum placement);
  - NO all-gather / all-to-all / collective-permute at all. GSPMD would
    insert activation-sized all-gathers around the shard_mapped Pallas
    regions if the manual sharding were wrong (ops/spatial.py:83-107 exists
    precisely to prevent that; its check_vma=False escape hatch makes this
    audit necessary), or around a mis-sharded batch op.

Both graph families are audited: a pure-XLA depth and a Pallas-span depth
(fade graphs, so the blend paths are included).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pggan_tpu.models import Discriminator, Generator
from pggan_tpu.training.state import init_state, make_optimizer
from pggan_tpu.training.steps import TrainStepBuilder


def _lower_step_hlo(depth: int, batch: int, group: int = 0) -> str:
    from jax.sharding import Mesh

    shape = (8, 3, 128, 128)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    G = Generator(shape, latent_size=16, fmap_base=512, fmap_max=32)
    D = Discriminator(shape, fmap_base=512, fmap_max=32)
    opt = make_optimizer()
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    state = init_state(G.init(ks[0]), D.init(ks[1]), opt, ks[2])
    b = TrainStepBuilder(G, D, opt, mesh=mesh)
    if depth == 5:  # the Pallas-span graph family must actually be engaged
        assert D._pallas_span(5) >= 1 and G._pallas_tail_start(5) is not None
    else:
        assert D._pallas_span(depth) == 0
    abstract_state = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), state)
    s = jax.ShapeDtypeStruct((), jnp.float32)
    if group:  # the Trainer's default grouped-dispatch (scan) program
        reals = jax.ShapeDtypeStruct(
            (group,) + b.real_batch_shape(depth, batch), jnp.float32)
        vec = jax.ShapeDtypeStruct((group,), jnp.float32)
        gstep = b.group_step_fn(depth, batch, fade=True, group=group)
        return gstep.lower(abstract_state, reals, vec, vec,
                           vec).compile().as_text()
    reals = jax.ShapeDtypeStruct(b.real_batch_shape(depth, batch),
                                 jnp.float32)
    step = b.step_fn(depth, batch, fade=True)
    return step.lower(abstract_state, reals, s, s, s).compile().as_text()


def _collect_collectives(hlo: str):
    """(kind, result_type_string) for every collective in the HLO.

    The result type is matched permissively (lazy ``.*?`` up to the op
    name): compiled HLO decorates types with layout/tiling braces and
    memory-space suffixes (``f32[16]{0:T(128)S(1)}``) and wraps multi-result
    ops in tuple parens — a restrictive character class silently skips
    those lines and turns the audit false-green (it would miss exactly the
    activation-sized all-gathers it exists to catch)."""
    out = []
    for line in hlo.splitlines():
        m = re.search(
            r"=\s*(.*?)\s*"
            r"(all-reduce|all-gather|all-to-all|collective-permute|"
            r"reduce-scatter)(-start|-done)?\(", line)
        if m:
            out.append((m.group(2), m.group(1).strip()))
    return out


def test_collect_collectives_sees_decorated_types():
    """Guard the audit's own eyes: layouts, tilings, tuples and async
    start/done forms must all be visible."""
    samples = [
        ("%all-reduce = f32[16]{0} all-reduce(f32[16]{0} %p)", "all-reduce",
         16),
        ("%ag = f32[16,4]{1,0:T(8,128)S(1)} all-gather(f32[4,4] %x)",
         "all-gather", 64),
        ("%ar = (f32[8]{0}, f32[2,2]{1,0}) all-reduce-start(...)",
         "all-reduce", 8),
        ("%cp = f32[] collective-permute(f32[] %s)", "collective-permute",
         1),
    ]
    for line, kind, first_size in samples:
        got = _collect_collectives(line)
        assert got and got[0][0] == kind, (line, got)
        assert _shape_sizes(got[0][1])[0] == first_size, (line, got)


def _shape_sizes(shape_str: str):
    """Total element count per result in an HLO result type string."""
    return [int(np.prod([int(d) for d in dims.split(",") if d.strip()] or [1]))
            for dims in re.findall(r"\[([0-9,]*)\]", shape_str)]


@pytest.mark.parametrize("depth,batch,group", [
    (4, 8, 0),   # pure-XLA graph family, per-step program
    (5, 8, 0),   # Pallas-span graph family, per-step program
    (5, 8, 2),   # Pallas-span family through the grouped-dispatch scan —
                 # the scan wrapper must not change the collective set
])
def test_sharded_step_collective_set(depth, batch, group):
    hlo = _lower_step_hlo(depth, batch, group)
    coll = _collect_collectives(hlo)
    kinds = {k for k, _ in coll}
    # gradient sync must exist...
    assert "all-reduce" in kinds, "no gradient all-reduce found"
    # ...and nothing else may: any gather/permute around the shard_mapped
    # Pallas regions or the batch ops means GSPMD is moving activations.
    forbidden = kinds - {"all-reduce"}
    assert not forbidden, f"unexpected collectives: {sorted(forbidden)}"

    # Every all-reduce result must be parameter-shaped or tiny (scalar
    # stats/metrics) — an activation-sized all-reduce would mean a batch
    # tensor is being reduced across shards.
    shape = (8, 3, 128, 128)
    G = Generator(shape, latent_size=16, fmap_base=512, fmap_max=32)
    D = Discriminator(shape, fmap_base=512, fmap_max=32)
    def sizes(shape):
        # raw param size, plus the graph-DERIVED weights whose grads are
        # also all-reduced: the fused pool+fromRGB tiles 1x1 kernels to 2x2
        # (discriminator fade path) and fused-scale upsample pads 3x3
        # kernels to 4x4 (generator) — both are conv weights the reverse
        # pass reduces at derived shape before folding back to the param
        out = {int(np.prod(shape))}
        if len(shape) == 4 and tuple(shape[:2]) == (1, 1):
            out.add(int(np.prod((2, 2) + tuple(shape[2:]))))
        if len(shape) == 4 and tuple(shape[:2]) == (3, 3):
            out.add(int(np.prod((4, 4) + tuple(shape[2:]))))
        return out

    param_sizes = set()
    for tree in (G.init(jax.random.PRNGKey(0)), D.init(jax.random.PRNGKey(1))):
        for x in jax.tree_util.tree_leaves(tree):
            param_sizes |= sizes(np.shape(x))
    allowed = param_sizes | {1}
    for kind, shp in coll:
        for size in _shape_sizes(shp):
            assert size in allowed or size <= 64, (
                f"activation-sized {kind} of {size} elements: {shp}")
