"""Distributed bundle adjustment: observations sharded over the device
mesh, Schur-complement reduction over psum collectives.

BASELINE north star config #5 ("distributed BA solved via Schur-complement
reduction over psum/all-gather collectives").  Decomposition:

* The observation table (cam_idx, pt_idx, uv, valid) is sharded on the
  mesh's data axis — observations are the O(N) axis in SfM.
* Each device computes its shard's contribution to the normal-equation
  terms (geometry/ba.normal_equation_terms — every term is a sum over
  observations, so sharded sums + psum is exact).
* The reduced camera system (small, 6C x 6C) is solved replicated on all
  devices; point back-substitution is elementwise over points.

Implemented with shard_map so the psums are explicit ICI collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sift_tpu.geometry.ba import (BAProblem, BAState, apply_step,
                                  normal_equation_terms, solve_schur)


def _pad_observations(p: BAProblem, n_shards: int) -> BAProblem:
    """Pad the observation axis to a multiple of the shard count (padding
    rows are invalid and contribute zero)."""
    o = p.cam_idx.shape[0]
    pad = (-o) % n_shards
    if pad == 0:
        return p
    zi = jnp.zeros((pad,), jnp.int32)
    return p._replace(
        cam_idx=jnp.concatenate([p.cam_idx, zi]),
        pt_idx=jnp.concatenate([p.pt_idx, zi]),
        uv=jnp.concatenate([p.uv, jnp.zeros((pad, 2), p.uv.dtype)]),
        valid=jnp.concatenate([p.valid, jnp.zeros((pad,), bool)]))


def make_distributed_lm(mesh: Mesh, axis: str = "data",
                        iterations: int = 10,
                        init_lambda: float = 1e-4):
    """Returns (fn, place) where fn(problem) runs the LM loop with
    observations sharded over ``mesh[axis]`` and place(problem) shards a
    host-built BAProblem accordingly."""
    n = mesh.shape[axis]

    obs_spec = BAProblem(
        rotations=P(), translations=P(), points=P(),
        cam_idx=P(axis), pt_idx=P(axis), uv=P(axis), valid=P(axis),
        fx=P(), fy=P(), cx=P(), cy=P())

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(obs_spec,),
        out_specs=BAState(rotations=P(), translations=P(), points=P(),
                          cost=P(), lm_lambda=P()))
    def run(p: BAProblem) -> BAState:
        def cost_of(rot, tr, pts):
            q = p._replace(rotations=rot, translations=tr, points=pts)
            local = normal_equation_terms(q)
            # mean cost: psum of local squared residuals / valid count
            from sift_tpu.geometry.ba import _residuals_and_jacobians
            res, _, _ = _residuals_and_jacobians(q)
            num = jax.lax.psum(jnp.sum(res * res), axis)
            den = jax.lax.psum(jnp.sum(p.valid), axis)
            return num / jnp.maximum(den, 1)

        def body(state, _):
            q = p._replace(rotations=state.rotations,
                           translations=state.translations,
                           points=state.points)
            local = normal_equation_terms(q)
            # The Schur reduction: every normal-equation term is a sum
            # over observations -> psum over the observation shards.
            terms = jax.lax.psum(local, axis)
            d_cam, d_pt = solve_schur(*terms, state.lm_lambda)
            rot, tr, pts = apply_step(q, d_cam, d_pt)
            new_cost = cost_of(rot, tr, pts)
            accept = new_cost < state.cost
            lam = jnp.clip(jnp.where(accept, state.lm_lambda * 0.5,
                                     state.lm_lambda * 4.0), 1e-8, 1e4)
            pick = lambda a, b: jnp.where(accept, a, b)
            return BAState(
                rotations=pick(rot, state.rotations),
                translations=pick(tr, state.translations),
                points=pick(pts, state.points),
                cost=pick(new_cost, state.cost), lm_lambda=lam), None

        init = BAState(
            rotations=p.rotations, translations=p.translations,
            points=p.points,
            cost=cost_of(p.rotations, p.translations, p.points),
            lm_lambda=jnp.asarray(init_lambda))
        out, _ = jax.lax.scan(body, init, None, length=iterations)
        return out

    fn = jax.jit(run)

    def place(p: BAProblem) -> BAProblem:
        p = _pad_observations(p, n)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            p, obs_spec)

    return fn, place
