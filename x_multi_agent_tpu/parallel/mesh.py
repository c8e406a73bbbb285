"""Multi-agent parallelism: agents sharded over the device mesh.

The reference's "distributed backend" is N independent VIO processes
exchanging payloads over a ROS network (SURVEY §2.9.5, §5.8). The TPU
re-design: all agents' filter states are one stacked pytree, sharded over
an ``agents`` mesh axis; per-agent filtering is vmapped; inter-agent
exchange (place recognition, CI fusion) becomes XLA collectives
(all_gather of fixed-size payloads) riding ICI instead of request-response
messaging.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ekf import ekf as ekf_mod
from ..vio import pipeline
from ..vio import track_manager as tm
from ..vio import vio as vio_mod


def make_agent_mesh(devices=None, name: str = "agents") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (name,))


@functools.partial(jax.jit, static_argnums=(0, 1))
def init_agents(params: vio_mod.VioParams, n_agents: int):
    """Stacked (FilterState, TrackSlots) for n_agents (leading agent dim)."""
    fs, slots = vio_mod.init_at_time(params, 0.0)
    stack = lambda x: jnp.broadcast_to(x, (n_agents,) + x.shape)
    return jax.tree.map(stack, fs), jax.tree.map(stack, slots)


def agent_step_fn(params: vio_mod.VioParams):
    """Per-agent full step: an IMU batch + one visual update.

    vmapped over the leading agent axis; shard_map the result over the mesh
    for multi-chip execution.
    """

    def one_agent(fs, slots, imu_times, imu_seqs, imu_w, imu_a, meas_time, meas):
        fs = ekf_mod.process_imu_batch_impl(
            params.ekf_params, fs, imu_times, imu_seqs, imu_w, imu_a
        )

        def update_fn(core, vision, cov, slots):
            return pipeline.visual_update(params.cfg, core, vision, cov, slots, meas)

        fs, slots, applied = ekf_mod.process_update_aux_impl(
            params.ekf_params, fs, meas_time, update_fn, slots
        )
        return fs, slots, applied

    return jax.vmap(one_agent)


def sharded_step(params: vio_mod.VioParams, mesh: Mesh):
    """The multi-chip step: agents data-parallel over the mesh axis.

    Collaborative exchange (all_gather of keyframe payloads + CI fusion)
    plugs in here once per exchange round — see parallel/collab.py.
    """
    step = agent_step_fn(params)
    aspec = P("agents")

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(aspec,) * 8,
        out_specs=(aspec, aspec, aspec),
        # purely data-parallel step (no cross-agent collectives);
        # vma checking currently mis-infers through the nested
        # vmap+scan+switch in the IMU path
        check_vma=False,
    )
    def _step(fs, slots, imu_times, imu_seqs, imu_w, imu_a, meas_time, meas):
        return step(fs, slots, imu_times, imu_seqs, imu_w, imu_a, meas_time, meas)

    return jax.jit(_step)


def sharded_collab_round(params: vio_mod.VioParams, ccfg, mesh: Mesh):
    """One collaborative exchange round over the device mesh (SURVEY §5.8):
    each device extracts its local agents' fixed-size payloads, the payload
    stack is an ``all_gather`` over the ``agents`` axis (the ROS broadcast
    of ``VIO::getDataToSend`` become an ICI collective), and CI fusion of
    every peer stays local to each agent's device.

    Semantically identical to the single-chip ``collab.collaborative_round``
    (tested for equality on the virtual CPU mesh).

    Returns jitted ``fs_stack -> (fs_stack, n_matches (A, A))``.
    """
    from . import collab

    aspec = P("agents")
    n_dev = mesh.devices.size

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(aspec,),
        out_specs=(aspec, aspec),
        check_vma=False,
    )
    def _round(fs_block):
        blk = fs_block.head.shape[0]  # agents per device
        a = n_dev * blk
        my_dev = jax.lax.axis_index("agents")
        payload_blk = jax.vmap(lambda fs: collab.extract_payload(params, fs))(
            fs_block
        )
        payloads = jax.lax.all_gather(payload_blk, "agents", axis=0, tiled=True)
        my_ids = my_dev * blk + jnp.arange(blk)

        def one_agent(fs, my_id):
            def peer_step(fs, b):
                peer = jax.tree.map(lambda x: x[b], payloads)
                fs, n = collab.fuse_with_peer(params, ccfg, fs, peer, b != my_id)
                return fs, n

            return jax.lax.scan(peer_step, fs, jnp.arange(a))

        return jax.vmap(one_agent)(fs_block, my_ids)

    return jax.jit(_round)
