"""Pallas-RDMA distributed diffuse sweep (SURVEY.md §5.8).

Third distribution strategy, the kernel-fused version of
`sweep_dist.diffuse_sweep_pipelined`: each device runs the full slab-sweep
Pallas kernel on its local (nslab, 3, ny, nz/P) block, and the per-slab
upwind halo LINES (the last k-column of each chain segment's exit
intensity, one (ny,) line per direction x band) travel to the right
neighbor with `pltpu.make_async_remote_copy` — raw ICI RDMA issued inside
the kernel, instead of XLA-scheduled `ppermute` between scan steps.

Schedule per slab (all devices in lockstep, grid steps are sequential):

  stage A: attenuate segment 1 for every (direction, band); pack the exit
           lines into the ping-pong send buffer; START the stage-A RDMA.
  stage B: wait the stage-A arrival, build segment-2 inputs (the first
           k-column comes from the neighbor, device 0 uses the UVB
           boundary), attenuate; pack + START the stage-B RDMA; ACK the
           consumed slot to the left neighbor.
  stage C: wait stage-B, attenuate segment 3, accumulate the weighted
           log-mean Jmean slab, select the next slab's carry intensities.

Flow control: 2-slot ping-pong buffers indexed by slab parity; a sender
may rewrite slot s (slab i) only after the receiver ACKed consuming slab
i-2 from that slot.  The ACK is a minimal reverse RDMA (right -> left) —
a remote semaphore_signal would be the natural primitive, but the Pallas
interpreter implements remote copies only, and a tiny remote copy carries
the same completion semantics on hardware.

The ring is CLOSED: device P-1 sends its (unused) halo lines to device 0,
which masks them with the UVB boundary, and device 0 ACKs leftward to
P-1.  Closing the ring keeps every device's send/wait sequence identical
— required both by the interpreter's lockstep shared-memory rendezvous
(asymmetric participation deadlocks it) and good practice on hardware
(uniform SPMD, no per-edge control flow).  DMA semaphores are drained
within each slab; leftover ACKs are drained on the last slab.

The arithmetic is identical to core.sweep.sweep_zone / sweep_dist
_sweep_zone_halo (the attenuation factors exp(-tau) and the log-mean
emissivity are independent of the incoming intensity, so all transcendental
work overlaps the halo flight by construction).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.sweep import SweepPlan, _tau_eps
from ..geometry import octants
from ..geometry.patterns import SEG_XZ

def _round_lanes(n: int) -> int:
    # Mosaic requires DMA slice shapes 128-aligned on the lane axis
    return 128 if n <= 128 else ((n + 127) // 128) * 128


def _sweep_zone_rdma_kernel(lens_ref, chain_ref, uvb_ref, scale_ref,
                            kappa_ref, j_ref,
                            itop_ref, out_ref,
                            sbuf_a, rbuf_a, sbuf_b, rbuf_b,
                            abuf_a, abuf_b,
                            send_a, recv_a, send_b, recv_b,
                            ack_send_a, ack_recv_a, ack_send_b, ack_recv_b,
                            *, ndir: int, n_shards: int, axis_name: str):
    """One slab step of the RDMA-pipelined zone sweep.

    Scalar prefetch as in core.sweep_pallas: lens_ref/chain_ref are
    (nslab*D*3,) SMEM; kappa_ref/j_ref are (1, 3, ny, nz_loc) VMEM blocks;
    itop_ref/out_ref are (D, 3, ny, nz_loc) VMEM carries (top-exit
    intensities / current segment exits); sbuf/rbuf are (2, ny, L) halo
    line buffers with one lane column per (direction, band).
    """
    i = pl.program_id(0)
    nslab = pl.num_programs(0)
    ny, nz = kappa_ref.shape[2], kappa_ref.shape[3]
    dtype = kappa_ref.dtype
    eps = _tau_eps(dtype)
    scale = scale_ref[0]

    my = jax.lax.axis_index(axis_name)
    nsh = jnp.int32(n_shards)
    right = jax.lax.rem(my.astype(jnp.int32) + 1, nsh)
    left = jax.lax.rem(my.astype(jnp.int32) + nsh - 1, nsh)
    s = jax.lax.rem(i, jnp.int32(2))

    rdma_a = pltpu.make_async_remote_copy(
        src_ref=sbuf_a.at[s], dst_ref=rbuf_a.at[s],
        send_sem=send_a.at[s], recv_sem=recv_a.at[s],
        device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
    rdma_b = pltpu.make_async_remote_copy(
        src_ref=sbuf_b.at[s], dst_ref=rbuf_b.at[s],
        send_sem=send_b.at[s], recv_sem=recv_b.at[s],
        device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
    # zero-payload reverse ACKs: slot 0 is the source cell, slot 1 the
    # destination cell on the LEFT neighbor
    ack_a = pltpu.make_async_remote_copy(
        src_ref=abuf_a.at[0], dst_ref=abuf_a.at[1],
        send_sem=ack_send_a.at[s], recv_sem=ack_recv_a.at[s],
        device_id=left, device_id_type=pltpu.DeviceIdType.LOGICAL)
    ack_b = pltpu.make_async_remote_copy(
        src_ref=abuf_b.at[0], dst_ref=abuf_b.at[1],
        send_sem=ack_send_b.at[s], recv_sem=ack_recv_b.at[s],
        device_id=left, device_id_type=pltpu.DeviceIdType.LOGICAL)

    @pl.when(i == 0)
    def _():
        for b in range(3):
            for d in range(ndir):
                itop_ref[d, b] = jnp.full((ny, nz), uvb_ref[b], dtype)

    def seg_factors(kappa_b, length):
        tau = kappa_b * length
        a = jnp.exp(-tau)
        emi = jnp.where(tau > eps, (1.0 - a) / jnp.where(tau > eps, tau, 1.0),
                        1.0 - 0.5 * tau)
        return a, emi

    # ---- stage A: segment 1 (xy top entry) --------------------------------
    @pl.when(i >= 2)
    def _():
        ack_a.wait_recv()

    for b in range(3):
        j_acc = jnp.zeros((ny, nz), dtype)
        for d in range(ndir):
            base = (i * ndir + d) * 3
            len_xy = lens_ref[base + 0]
            n_act = chain_ref[base + 2].astype(dtype)
            a1, emi1 = seg_factors(kappa_ref[0, b], len_xy)
            i_in1 = itop_ref[d, b]
            i_out1 = i_in1 * a1
            j_acc = j_acc + (i_in1 * emi1) / n_act
            out_ref[d, b] = i_out1
            sbuf_a[s, :, d * 3 + b:d * 3 + b + 1] = i_out1[:, nz - 1:nz]
        j_ref[0, b] = scale * j_acc

    rdma_a.start()

    # ---- stage B: segment 2 ------------------------------------------------
    rdma_a.wait_recv()

    @pl.when(i >= 2)
    def _():
        ack_b.wait_recv()

    for b in range(3):
        uvb_b = uvb_ref[b]
        uvb_row = jnp.full((1, nz), uvb_b, dtype)
        j_acc = jnp.zeros((ny, nz), dtype)
        for d in range(ndir):
            base = (i * ndir + d) * 3
            len_xz = lens_ref[base + 1]
            len_yz = lens_ref[base + 2]
            chain2 = chain_ref[base + 0]
            n_act = chain_ref[base + 2].astype(dtype)
            is_xz = chain2 == SEG_XZ
            act2 = (chain2 != 0).astype(dtype)

            i_out1 = out_ref[d, b]
            halo = jnp.where(my == 0, jnp.full((ny, 1), uvb_b, dtype),
                             rbuf_a[s, :, d * 3 + b:d * 3 + b + 1])
            in_j = jnp.concatenate([uvb_row, i_out1[:-1, :]], axis=0)
            in_k = jnp.concatenate([halo, i_out1[:, :-1]], axis=1)
            i_in2 = jnp.where(is_xz, in_j, in_k)
            a2, emi2 = seg_factors(kappa_ref[0, b],
                                   jnp.where(is_xz, len_xz, len_yz))
            i_out2 = i_in2 * a2
            j_acc = j_acc + act2 * (i_in2 * emi2) / n_act
            keep = jnp.where(act2 > 0, i_out2, i_out1)
            out_ref[d, b] = keep
            sbuf_b[s, :, d * 3 + b:d * 3 + b + 1] = keep[:, nz - 1:nz]
        j_ref[0, b] = j_ref[0, b] + scale * j_acc

    ack_a.start()
    ack_a.wait_send()
    rdma_a.wait_send()
    rdma_b.start()

    # ---- stage C: segment 3 ------------------------------------------------
    rdma_b.wait_recv()

    for b in range(3):
        uvb_b = uvb_ref[b]
        uvb_row = jnp.full((1, nz), uvb_b, dtype)
        j_acc = jnp.zeros((ny, nz), dtype)
        for d in range(ndir):
            base = (i * ndir + d) * 3
            len_xz = lens_ref[base + 1]
            len_yz = lens_ref[base + 2]
            chain3 = chain_ref[base + 1]
            n_act = chain_ref[base + 2].astype(dtype)
            is_xz = chain3 == SEG_XZ
            act3 = (chain3 != 0).astype(dtype)

            i_out2 = out_ref[d, b]
            halo = jnp.where(my == 0, jnp.full((ny, 1), uvb_b, dtype),
                             rbuf_b[s, :, d * 3 + b:d * 3 + b + 1])
            in_j = jnp.concatenate([uvb_row, i_out2[:-1, :]], axis=0)
            in_k = jnp.concatenate([halo, i_out2[:, :-1]], axis=1)
            i_in3 = jnp.where(is_xz, in_j, in_k)
            a3, emi3 = seg_factors(kappa_ref[0, b],
                                   jnp.where(is_xz, len_xz, len_yz))
            i_out3 = i_in3 * a3
            j_acc = j_acc + act3 * (i_in3 * emi3) / n_act
            itop_ref[d, b] = jnp.where(act3 > 0, i_out3, i_out2)
        j_ref[0, b] = j_ref[0, b] + scale * j_acc

    ack_b.start()
    ack_b.wait_send()
    rdma_b.wait_send()

    # drain the ACKs the last two slabs never reuse (semaphores must not
    # carry residue past the kernel); the un-waited slots are (nslab-1)%2
    # and, when nslab >= 2, (nslab-2)%2
    @pl.when(i == nslab - 1)
    def _():
        ack_a.wait_recv()
        ack_b.wait_recv()

    if nslab >= 2:
        @pl.when(i == nslab - 1)
        def _():
            so = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))
            for abuf, sems in ((abuf_a, (ack_send_a, ack_recv_a)),
                               (abuf_b, (ack_send_b, ack_recv_b))):
                pltpu.make_async_remote_copy(
                    src_ref=abuf.at[0], dst_ref=abuf.at[1],
                    send_sem=sems[0].at[so], recv_sem=sems[1].at[so],
                    device_id=left,
                    device_id_type=pltpu.DeviceIdType.LOGICAL).wait_recv()


@functools.partial(
    jax.jit, static_argnames=("ndir", "nslab", "ny", "nz", "n_shards",
                              "axis_name", "interpret"))
def _sweep_zone_rdma(kappa_rot, lens, chains, uvb, weight, *,
                     ndir, nslab, ny, nz, n_shards, axis_name,
                     interpret=False):
    dtype = kappa_rot.dtype
    lanes = _round_lanes(ndir * 3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nslab,),
        in_specs=[pl.BlockSpec((1, 3, ny, nz), lambda i, *_: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 3, ny, nz), lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((ndir, 3, ny, nz), dtype),   # itop carry
            pltpu.VMEM((ndir, 3, ny, nz), dtype),   # segment-exit store
            pltpu.VMEM((2, ny, lanes), dtype),      # sbuf A
            pltpu.VMEM((2, ny, lanes), dtype),      # rbuf A
            pltpu.VMEM((2, ny, lanes), dtype),      # sbuf B
            pltpu.VMEM((2, ny, lanes), dtype),      # rbuf B
            pltpu.VMEM((2, 8, 128), dtype),          # ack payload A
            pltpu.VMEM((2, 8, 128), dtype),          # ack payload B
            pltpu.SemaphoreType.DMA((2,)),           # send A
            pltpu.SemaphoreType.DMA((2,)),           # recv A
            pltpu.SemaphoreType.DMA((2,)),           # send B
            pltpu.SemaphoreType.DMA((2,)),           # recv B
            pltpu.SemaphoreType.DMA((2,)),           # ack send A
            pltpu.SemaphoreType.DMA((2,)),           # ack recv A
            pltpu.SemaphoreType.DMA((2,)),           # ack send B
            pltpu.SemaphoreType.DMA((2,)),           # ack recv B
        ],
    )
    kernel = partial(_sweep_zone_rdma_kernel, ndir=ndir, n_shards=n_shards,
                     axis_name=axis_name)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nslab, 3, ny, nz), dtype),
        # no barrier semaphore needed: the end-of-kernel ACK drain already
        # guarantees a device leaves the kernel only after its right
        # neighbor consumed every line it sent, which also serializes
        # back-to-back zone kernels safely
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lens, chains, uvb.astype(dtype), jnp.full((1,), weight, dtype),
      kappa_rot)


def diffuse_sweep_rdma(kappa, plan: SweepPlan, uvb, cell_size, mesh: Mesh,
                       interpret: bool = False) -> jax.Array:
    """Grid-decomposed sweep with in-kernel RDMA halo lines.

    Same contract as sweep_dist.diffuse_sweep_pipelined (and matches it to
    float roundoff); `interpret=True` runs the Pallas interpreter so the
    ring protocol is testable on a CPU mesh.
    """
    from ..core.sweep_pallas import zone_arrays

    axis = mesh.axis_names[0]
    n_shards = int(np.prod(mesh.devices.shape))
    dtype = kappa.dtype
    uvb = jnp.asarray(uvb, dtype)
    kappa_l = jnp.moveaxis(kappa, 0, -1)                    # (nx,ny,nz,3)
    grid_spec = P(None, None, axis, None)
    jmean = jax.lax.with_sharding_constraint(
        jnp.zeros_like(kappa_l), NamedSharding(mesh, grid_spec))

    for zone in plan.zones:
        krot = octants.rotate_to_sweep(kappa_l, zone.izone)
        krot = jnp.moveaxis(krot, -1, 1)                    # (nslab,3,ny,nz)
        krot = jax.lax.with_sharding_constraint(
            krot, NamedSharding(mesh, P(None, None, None, axis)))
        nslab, _, ny, nz = krot.shape
        lens, chains = zone_arrays(zone, cell_size, dtype)
        worker = jax.shard_map(
            partial(_sweep_zone_rdma, ndir=zone.ndir, nslab=nslab, ny=ny,
                    nz=nz // n_shards, n_shards=n_shards, axis_name=axis,
                    interpret=interpret),
            mesh=mesh,
            in_specs=(P(None, None, None, axis), P(), P(), P(), P()),
            out_specs=P(None, None, None, axis),
            check_vma=False)
        j_rot = worker(krot, lens, chains, uvb,
                       jnp.asarray(plan.weight, dtype))
        j_rot = jnp.moveaxis(j_rot, 1, -1)
        jmean = jmean + jax.lax.with_sharding_constraint(
            octants.rotate_from_sweep(j_rot, zone.izone),
            NamedSharding(mesh, grid_spec))
    return jnp.moveaxis(jmean, -1, 0)


def make_jitted_sweep_rdma(plan: SweepPlan, mesh: Mesh,
                           interpret: bool = False):
    return jax.jit(lambda kappa, uvb, cell_size: diffuse_sweep_rdma(
        kappa, plan, uvb, cell_size, mesh, interpret=interpret))
