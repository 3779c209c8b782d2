"""Distributed pose-graph solve: factors sharded over the mesh, poses
replicated, Gram-vector products reduced with `psum`.

The SP/long-sequence scaling story (SURVEY.md §2.3): the factor lists
(between + GPS) shard along the ``kf`` mesh axis; each device linearizes and
scatter-adds only its factor shard, and every global quantity the PCG loop
needs (A·v, b, diagonal blocks, dot products) is one `lax.psum` over the
mesh — collectives ride ICI. The pose vector (K,6) stays replicated, which
is the right tradeoff while 6K floats ≪ factor work.

Implemented with `shard_map` so the collective structure is explicit and
compiler-checkable, not inferred.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core import se3
from ..pgo.graph import PoseGraph, PoseGraphConfig
from ..pgo.solver import _between_residuals, _gps_residuals, _prior_residual
from ..utils.precision import geometry_precision

_EPS = 1e-12


def _pad_to_multiple(x, m, fill=0):
    n = x.shape[0]
    pad = (-n) % m
    if pad == 0:
        return x
    pad_block = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x, pad_block], axis=0)


@geometry_precision
def solve_sharded(g: PoseGraph, cfg: PoseGraphConfig, mesh: Mesh, axis: str = "kf"):
    """LM solve with factor arrays sharded along ``axis``. API-compatible
    with :func:`fastliosam_tpu.pgo.solve` (returns graph, cost)."""
    n_dev = mesh.shape[axis]
    prior_pose = g.poses[0]
    K = g.poses.shape[0]

    # pad factor arrays so they divide evenly across devices
    gp = g._replace(
        bt_i=_pad_to_multiple(g.bt_i, n_dev),
        bt_j=_pad_to_multiple(g.bt_j, n_dev),
        bt_rel=_pad_to_multiple(
            g.bt_rel, n_dev
        ).at[g.bt_rel.shape[0]:, :, :].set(jnp.eye(4, dtype=jnp.float32)),
        bt_sqrt_info=_pad_to_multiple(g.bt_sqrt_info, n_dev),
        bt_valid=_pad_to_multiple(g.bt_valid, n_dev),
        gps_idx=_pad_to_multiple(g.gps_idx, n_dev),
        gps_xyz=_pad_to_multiple(g.gps_xyz, n_dev),
        gps_sqrt_info=_pad_to_multiple(g.gps_sqrt_info, n_dev),
        gps_valid=_pad_to_multiple(g.gps_valid, n_dev),
    )

    fspec = P(axis)
    fspec2 = P(axis, None)
    fspec3 = P(axis, None, None)
    rep = P()

    in_specs = (
        rep,  # poses
        rep,  # kf_valid
        fspec,  # bt_i
        fspec,  # bt_j
        fspec3,  # bt_rel
        fspec2,  # bt_sqrt_info
        fspec,  # bt_valid
        fspec,  # gps_idx
        fspec2,  # gps_xyz
        fspec2,  # gps_sqrt_info
        fspec,  # gps_valid
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=rep,
        check_vma=False,
    )
    def lm_solve(
        poses,
        kf_valid,
        bt_i,
        bt_j,
        bt_rel,
        bt_sqrt_info,
        bt_valid,
        gps_idx,
        gps_xyz,
        gps_sqrt_info,
        gps_valid,
    ):
        """Runs identically on every device over its factor shard."""

        def shard_graph(p, bt_si=None):
            return PoseGraph(
                poses=p,
                kf_valid=kf_valid,
                n_kf=jnp.sum(kf_valid.astype(jnp.int32)),
                bt_i=bt_i,
                bt_j=bt_j,
                bt_rel=bt_rel,
                bt_sqrt_info=bt_sqrt_info if bt_si is None else bt_si,
                bt_valid=bt_valid,
                n_bt=jnp.sum(bt_valid.astype(jnp.int32)),
                gps_idx=gps_idx,
                gps_xyz=gps_xyz,
                gps_sqrt_info=gps_sqrt_info,
                gps_valid=gps_valid,
                n_gps=jnp.sum(gps_valid.astype(jnp.int32)),
            )

        # GNC on loop factors (PoseGraphConfig.loop_gnc_barc): weights are
        # per-factor and factor-sharded, so each shard computes its own;
        # only the mu_0 initialization needs a collective (pmax below)
        use_gnc = cfg.loop_gnc_barc > 0.0
        is_loop = (jnp.abs(bt_i - bt_j) > 1) & bt_valid

        def loop_resid2(p):
            # chain-aware consistency residual (pgo.solver._loop_resid2)
            Ti = p[bt_i]
            Tj = p[bt_j]
            E = se3.compose(se3.inverse(bt_rel), se3.between(Ti, Tj))
            r0 = se3.log(E)
            rt2 = jnp.sum(r0[:, :3] ** 2, axis=-1)
            rr2 = jnp.sum(r0[:, 3:] ** 2, axis=-1)
            d = jnp.abs(bt_i - bt_j).astype(jnp.float32)
            si_t = jnp.mean(bt_sqrt_info[:, :3], axis=-1)
            si_r = jnp.mean(bt_sqrt_info[:, 3:], axis=-1)
            var_t = (1.0 / jnp.maximum(si_t, _EPS) ** 2
                     + cfg.gnc_hop_trans_var * d)
            var_r = (1.0 / jnp.maximum(si_r, _EPS) ** 2
                     + cfg.gnc_hop_rot_var * d)
            return (rt2 / var_t + rr2 / var_r) * bt_valid

        def gnc_bt_si(p, mu):
            if not use_gnc:
                return None
            c2 = jnp.float32(cfg.loop_gnc_barc ** 2)
            w = (mu * c2 / (loop_resid2(p) + mu * c2)) ** 2
            sw = jnp.sqrt(jnp.where(is_loop, w, 1.0))
            return bt_sqrt_info * sw[:, None]

        def cost_of(p, bt_si=None):
            gg = shard_graph(p, bt_si)
            rb, _, _ = _between_residuals(gg)
            rg, _ = _gps_residuals(gg)
            local = 0.5 * (jnp.sum(rb * rb) + jnp.sum(rg * rg))
            total = jax.lax.psum(local, axis)
            rp, _ = _prior_residual(gg, cfg, prior_pose)
            return total + 0.5 * jnp.sum(rp * rp)

        def linearize(p, bt_si=None):
            gg = shard_graph(p, bt_si)
            rb, Ji, Jj = _between_residuals(gg)
            rg, Jg = _gps_residuals(gg)
            rp, Jp = _prior_residual(gg, cfg, prior_pose)

            b = jnp.zeros((K, 6), jnp.float32)
            b = b.at[bt_i].add(-jnp.einsum("fij,fi->fj", Ji, rb))
            b = b.at[bt_j].add(-jnp.einsum("fij,fi->fj", Jj, rb))
            b = b.at[gps_idx].add(-jnp.einsum("fij,fi->fj", Jg, rg))
            b = jax.lax.psum(b, axis)
            b = b.at[0].add(-(Jp.T @ rp))

            Hd = jnp.zeros((K, 6, 6), jnp.float32)
            Hd = Hd.at[bt_i].add(jnp.einsum("fki,fkj->fij", Ji, Ji))
            Hd = Hd.at[bt_j].add(jnp.einsum("fki,fkj->fij", Jj, Jj))
            Hd = Hd.at[gps_idx].add(jnp.einsum("fki,fkj->fij", Jg, Jg))
            Hd = jax.lax.psum(Hd, axis)
            Hd = Hd.at[0].add(Jp.T @ Jp)

            def matvec(v, lam):
                ub = jnp.einsum("fij,fj->fi", Ji, v[bt_i]) + jnp.einsum(
                    "fij,fj->fi", Jj, v[bt_j]
                )
                y = jnp.zeros((K, 6), jnp.float32)
                y = y.at[bt_i].add(jnp.einsum("fij,fi->fj", Ji, ub))
                y = y.at[bt_j].add(jnp.einsum("fij,fi->fj", Jj, ub))
                ug = jnp.einsum("fij,fj->fi", Jg, v[gps_idx])
                y = y.at[gps_idx].add(jnp.einsum("fij,fi->fj", Jg, ug))
                y = jax.lax.psum(y, axis)
                y = y.at[0].add(Jp.T @ (Jp @ v[0]))
                diag = jnp.diagonal(Hd, axis1=-2, axis2=-1)
                return y + lam * diag * v + 1e-6 * v

            return b, Hd, matvec

        def pcg(matvec, b, Hd, lam):
            diag = jnp.diagonal(Hd, axis1=-2, axis2=-1)
            Mb = Hd + jax.vmap(jnp.diag)(lam * diag + 1e-6)
            Minv = jnp.linalg.inv(Mb)

            def apply_M(r):
                return jnp.einsum("kij,kj->ki", Minv, r)

            x = jnp.zeros_like(b)
            r = b
            z = apply_M(r)
            p = z
            rz = jnp.sum(r * z)

            def body(carry, _):
                x, r, p, rz = carry
                Ap = matvec(p, lam)
                pAp = jnp.sum(p * Ap)
                alpha = jnp.where(pAp > _EPS, rz / jnp.maximum(pAp, _EPS), 0.0)
                x = x + alpha * p
                r = r - alpha * Ap
                z = apply_M(r)
                rz_new = jnp.sum(r * z)
                beta = jnp.where(rz > _EPS, rz_new / jnp.maximum(rz, _EPS), 0.0)
                p = z + beta * p
                return (x, r, p, rz_new), None

            (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None,
                                           length=cfg.pcg_iters)
            return x

        kf_mask = kf_valid[:, None].astype(jnp.float32)

        def lm_scan(poses0, bt_si):
            """Full LM loop under FIXED (possibly GNC-scaled) weights —
            mirrors pgo.solver.solve's inner loop."""

            def lm_iter(carry, _):
                poses, lam, cost = carry
                b, Hd, matvec = linearize(poses, bt_si)
                dx = pcg(matvec, b, Hd, lam) * kf_mask
                cand = se3.retract(poses, dx)
                cand = jnp.where(kf_valid[:, None, None], cand, poses)
                new_cost = cost_of(cand, bt_si)
                accept = new_cost < cost
                poses = jnp.where(accept, cand, poses)
                cost = jnp.where(accept, new_cost, cost)
                lam = jnp.clip(
                    jnp.where(accept, lam * cfg.lambda_down,
                              lam * cfg.lambda_up),
                    1e-9,
                    1e6,
                )
                return (poses, lam, cost), None

            cost0 = cost_of(poses0, bt_si)
            (p, _, cost), _ = jax.lax.scan(
                lm_iter,
                (poses0, jnp.float32(cfg.lambda_init), cost0),
                None,
                length=cfg.lm_iters,
            )
            return p, cost

        if not use_gnc:
            return lm_scan(poses, None)

        r2max = jax.lax.pmax(
            jnp.max(jnp.where(is_loop, loop_resid2(poses), 0.0)), axis
        )
        mu0 = jnp.maximum(
            2.0 * r2max / jnp.float32(cfg.loop_gnc_barc ** 2), 1.0
        )
        if cfg.gnc_div > 0.0:
            gnc_div = jnp.float32(cfg.gnc_div)
        else:  # auto (see pgo.solver.solve)
            gnc_div = jnp.exp(
                jnp.log(mu0) / jnp.float32(max(cfg.gnc_stages - 1, 1))
            )

        def gnc_stage(carry, _):
            p, mu = carry
            p, cost = lm_scan(p, gnc_bt_si(p, mu))
            mu = jnp.maximum(mu / gnc_div, 1.0)
            return (p, mu), cost

        (poses, _), costs = jax.lax.scan(
            gnc_stage, (poses, mu0), None, length=cfg.gnc_stages
        )
        return poses, costs[-1]

    poses, cost = lm_solve(
        gp.poses,
        gp.kf_valid,
        gp.bt_i,
        gp.bt_j,
        gp.bt_rel,
        gp.bt_sqrt_info,
        gp.bt_valid,
        gp.gps_idx,
        gp.gps_xyz,
        gp.gps_sqrt_info,
        gp.gps_valid,
    )
    return g._replace(poses=poses), cost
