"""RAFT model (TPU-native JAX/flax).

Forward parity with the reference (``raft/__init__.py:110-176``): normalize images
to [-1, 1], siamese fnet over the concatenated pair, all-pairs correlation pyramid,
cnet -> (net=tanh, inp=relu), then N refinement iterations of
{corr lookup -> update block -> delta flow -> convex upsample x8}, with
stop-gradient on coords at the top of each iteration (raft/__init__.py:155) and the
coords update computed in float32 (raft/__init__.py:88,163 dtype islands).

Differences from the reference by design (TPU-first):

- flow predictions are returned stacked as [iters, B, H, W, 2] instead of Python
  lists, so sequence losses vectorize over the leading axis;
- the model optionally owns a *teacher* update block (the flow-supervisor head,
  reference ``raft/semi.py:15-77``) sharing fnet/cnet with the student, exposed via
  ``method="teacher_iterate"``;
- per-iteration rematerialization (``cfg.remat``) trades FLOPs for HBM during
  training instead of relying on framework autotuning.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from flow_supervisor_tpu.models.encoders import BasicEncoder, SmallEncoder
from flow_supervisor_tpu.models.update import BasicUpdateBlock, SmallUpdateBlock
from flow_supervisor_tpu.ops.coords import coords_grid, downsample_shape, resize_flow
from flow_supervisor_tpu.ops.corr import (
    all_pairs_correlation,
    build_corr_pyramid,
    corr_pyramid_lookup,
)
from flow_supervisor_tpu.ops.upsample import upsample_convex


def _crop_upsample(flow_low, mask, crop_yx8, hw8, out_size):
    """Convex-upsample only a crop window of a full-frame low-res field.

    Bit-identical to ``crop_bboxes(upsample_convex(flow_low, mask)*8)`` for
    8-aligned crops (the upsample is local: each output pixel reads one mask
    cell and its 3x3 low-res neighborhood), but does ~(crop/full) of the work
    and never materializes the full-res field. The 1-px halo is sliced from
    the zero-padded full field, so windows touching the frame border see the
    same zero neighbors the full-frame upsample would.
    """
    h8, w8 = hw8
    xp = jnp.pad(flow_low, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def one(img, off):
        return jax.lax.dynamic_slice(
            img, (off[0], off[1], 0), (h8 + 2, w8 + 2, img.shape[-1])
        )

    from flow_supervisor_tpu.ops.pad import crop_bboxes

    off = crop_yx8.astype(jnp.int32)
    halo = jax.vmap(one)(xp, off)
    mask_c = crop_bboxes(mask, off, (h8, w8))
    return upsample_convex(halo, mask_c, out_size, pre_padded=True)


@dataclasses.dataclass(frozen=True)
class RAFTConfig:
    """Canonical hyperparameters (reference ``RAFTArgs``, raft/__init__.py:12-42)."""

    small: bool = False
    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 4
    dropout: float = 0.0
    convex_upsampling: bool = True
    teacher: bool = False  # add the flow-supervisor teacher update block
    teacher_iters: int = 12  # reference default (semi.py:550)
    update_ckpt: bool = False  # remat each refinement iteration
    # lax.scan over iterations: 12x smaller HLO / far faster compiles, but
    # measurably slower on-device (8% fwd; 3.5x on the remat training step —
    # scan blocks cross-iteration scheduling). Unrolled is the production
    # default; flip on for fast-compile development loops.
    scan_iters: bool = False
    freeze_bn: bool = False  # use running batch-norm stats even in training
    # (reference freezes BN for every stage but chairs, train.py:180-181)
    # GMA variant (reference pytorch/core/gma_network.py)
    gma: bool = False
    num_heads: int = 1
    position_only: bool = False
    position_and_content: bool = False
    dtype: Any = jnp.float32  # compute dtype (bfloat16 for perf)
    corr_dtype: Any = jnp.float32  # correlation volume storage dtype
    # correlation-lookup backend: "auto" picks "fused" (volume-free Pallas
    # kernel, kernels/corr_fused.py — recomputes correlation slabs in VMEM
    # from the fmap factors, alt_cuda_corr parity: nothing volume-sized ever
    # touches HBM) on a TPU backend and "einsum" (XLA one-hot matmuls,
    # ops/corr.py) elsewhere, where a Pallas kernel would run interpreted.
    # "pallas" selects the materialized-plane slice+roll kernel
    # (kernels/corr_lookup_v2.py), kept for A/B and HBM-rich shapes.
    # "plane" materializes the planes once per forward like "pallas" but
    # finishes extraction + bilinear combine inside one pallas call per lookup
    # (kernels/corr_plane.py) — no per-iteration recompute dots, no XLA-side
    # combine.
    lookup_backend: str = "auto"
    # emit corr window channels dy-major and fold the reference's dx-major
    # order into the motion encoder's first 1x1 conv weights (corr_perm) —
    # skips a 7 ms/fwd channel transpose; numerics identical up to fp
    # summation order. Off = reference channel order end to end.
    dy_major_corr: bool = True
    # pallas instance-norm(+relu) in the encoders on TPU backends
    # (kernels/norm.py; ~18.7 ms/fwd of XLA layout pivots measured at
    # 448x1024). parallel/spatial.py turns this off: under SPMD the spatial
    # mean must become a cross-device collective, which only the XLA lowering
    # gets automatically.
    fused_norm: bool = True

    @property
    def hidden_dim(self) -> int:
        return 96 if self.small else 128

    @property
    def context_dim(self) -> int:
        return 64 if self.small else 128

    def resolved(self) -> "RAFTConfig":
        backend = self.lookup_backend
        if backend == "auto":
            backend = (
                "fused"
                if jax.default_backend() in ("tpu", "axon")
                else "einsum"
            )
        if self.small:
            # small model has no convex-upsampling mask head (RAFTArgs raises on
            # the combination, raft/__init__.py:40-42)
            return dataclasses.replace(
                self, corr_levels=4, corr_radius=3, convex_upsampling=False,
                lookup_backend=backend,
            )
        return dataclasses.replace(
            self, corr_levels=4, corr_radius=4, lookup_backend=backend
        )


class RAFT(nn.Module):
    cfg: RAFTConfig

    def setup(self):
        cfg = self.cfg
        hdim, cdim = cfg.hidden_dim, cfg.context_dim
        if cfg.small:
            self.fnet = SmallEncoder(
                128, "instance", cfg.dropout, cfg.dtype, cfg.fused_norm
            )
            self.cnet = SmallEncoder(
                hdim + cdim, "none", cfg.dropout, cfg.dtype, cfg.fused_norm
            )
            block = SmallUpdateBlock
            kwargs = dict(
                hidden_dim=hdim,
                corr_levels=cfg.corr_levels,
                corr_radius=cfg.corr_radius,
                dtype=cfg.dtype,
                dy_major_corr=cfg.dy_major_corr,
            )
        else:
            self.fnet = BasicEncoder(
                256, "instance", cfg.dropout, cfg.dtype, cfg.fused_norm
            )
            self.cnet = BasicEncoder(
                hdim + cdim, "batch", cfg.dropout, cfg.dtype, cfg.fused_norm
            )
            if cfg.gma:
                from flow_supervisor_tpu.models.gma import Attention, GMAUpdateBlock

                block = GMAUpdateBlock
                kwargs = dict(
                    hidden_dim=hdim,
                    corr_levels=cfg.corr_levels,
                    corr_radius=cfg.corr_radius,
                    heads=cfg.num_heads,
                    convex_upsampling=cfg.convex_upsampling,
                    dtype=cfg.dtype,
                    dy_major_corr=cfg.dy_major_corr,
                )
                self.att = Attention(
                    dim=cdim,
                    heads=cfg.num_heads,
                    dim_head=cdim,
                    max_pos_size=160,
                    position_only=cfg.position_only,
                    position_and_content=cfg.position_and_content,
                    dtype=cfg.dtype,
                )
            else:
                block = BasicUpdateBlock
                kwargs = dict(
                    hidden_dim=hdim,
                    corr_levels=cfg.corr_levels,
                    corr_radius=cfg.corr_radius,
                    convex_upsampling=cfg.convex_upsampling,
                    dtype=cfg.dtype,
                    dy_major_corr=cfg.dy_major_corr,
                )
        if cfg.update_ckpt:
            block = nn.remat(block)
        self.update_block = block(**kwargs)
        if cfg.teacher:
            self.teacher_update_block = block(**kwargs)

    # ---- components (reference refactor unsup.py:25-94 feature/flow nets) ----

    def features(self, image1, image2, train: bool = False):
        """fnet over the normalized concatenated pair -> (fmap1, fmap2)."""
        x = jnp.concatenate([image1, image2], axis=0).astype(self.cfg.dtype)
        fmaps = self.fnet(2.0 * x - 1.0, train and not self.cfg.freeze_bn)
        return jnp.split(fmaps, 2, axis=0)

    def context(self, image1, train: bool = False):
        """cnet -> (net=tanh(hidden), inp=relu(context))."""
        cnet = self.cnet(
            2.0 * image1.astype(self.cfg.dtype) - 1.0,
            train and not self.cfg.freeze_bn,
        )
        net, inp = jnp.split(cnet, [self.cfg.hidden_dim], axis=-1)
        return jnp.tanh(net), nn.relu(inp)

    def attention_map(self, inp):
        """GMA attention over the relu'd context features, computed once per
        forward (reference gma_network.py); None for the plain model."""
        return self.att(inp) if self.cfg.gma else None

    def iterate(
        self,
        net,
        inp,
        corr_pyramid,
        coords0,
        coords1,
        out_size,
        iters: int,
        teacher: bool = False,
        stop_coord_gradient: bool = True,
        attention=None,
        final_flow_only: bool = False,
        crop=None,
    ):
        """Run `iters` refinement steps; returns (net, coords1, flows_up, flows_low).

        flows_up: [iters, B, H, W, 2] full-res; flows_low: [iters, B, h8, w8, 2].

        The loop runs under ``lax.scan`` with broadcast parameters (one copy of
        the update block in the compiled program instead of ``iters`` — an
        order-of-magnitude smaller HLO and faster compiles than the reference's
        unrolled Python loop); ``cfg.scan_iters=False`` falls back to unrolling.

        ``final_flow_only``: compute the full-res convex upsample ONCE, after
        the loop, and return flows_up with length 1 (training losses consume
        every iteration's upsample; inference consumes only ``[-1]``, and in
        scan mode XLA cannot dead-code the 11 wasted full-res softmax+combine
        passes the way it does for the unrolled loop). flows_low keeps all
        iterations (cheap 1/8-res, used by warm start).

        ``crop``: ``(crop_yx8, (h8, w8), (h, w))`` — upsample only that
        per-sample window of the (full-frame) low-res flow, at crop
        resolution: flows_up come back [iters, B, h, w, 2] already in the
        crop frame (bit-identical to full-frame upsample + crop_bboxes; the
        teacher path's consumers only ever see the cropped predictions,
        reference semi.py:239-248). flows_low stay full-frame.
        """
        has_mask = self.cfg.convex_upsampling

        def step(mdl, carry, _):
            net, coords1 = carry[0], carry[1]
            block = mdl.teacher_update_block if teacher else mdl.update_block
            if stop_coord_gradient:
                coords1 = jax.lax.stop_gradient(coords1)
            flow = coords1 - coords0
            if mdl.cfg.lookup_backend == "zero":
                # perf-ablation backend: everything except the lookup
                b_, h8_, w8_ = coords1.shape[0], coords1.shape[1], coords1.shape[2]
                k2 = mdl.cfg.corr_levels * (2 * mdl.cfg.corr_radius + 1) ** 2
                corr = jnp.zeros((b_, h8_, w8_, k2), jnp.float32) + jnp.sum(
                    coords1
                ) * 0.0
            elif mdl.cfg.lookup_backend == "pallas":
                from flow_supervisor_tpu.kernels.corr_lookup_v2 import (
                    corr_pyramid_lookup_v2,
                )

                corr = corr_pyramid_lookup_v2(
                    corr_pyramid, coords1, mdl.cfg.corr_radius,
                    dy_major=mdl.cfg.dy_major_corr,
                )
            elif mdl.cfg.lookup_backend == "plane":
                from flow_supervisor_tpu.kernels.corr_plane import (
                    corr_pyramid_lookup_plane,
                )

                corr = corr_pyramid_lookup_plane(
                    corr_pyramid, coords1, mdl.cfg.corr_radius,
                    dy_major=mdl.cfg.dy_major_corr,
                    # write the consumer dtype straight from the kernel: the
                    # f32->dtype cast below becomes a no-op (bit-identical,
                    # skips a [BQ, L*k^2] f32 round-trip per iteration)
                    out_dtype=mdl.cfg.dtype,
                )
            elif mdl.cfg.lookup_backend == "fused":
                from flow_supervisor_tpu.kernels.corr_fused import (
                    corr_pyramid_lookup_fused,
                )

                corr = corr_pyramid_lookup_fused(
                    corr_pyramid, coords1, mdl.cfg.corr_radius,
                    dy_major=mdl.cfg.dy_major_corr,
                    out_dtype=mdl.cfg.dtype,  # see plane-backend note above
                )
            else:
                corr = corr_pyramid_lookup(
                    corr_pyramid, coords1, mdl.cfg.corr_radius,
                    dy_major=mdl.cfg.dy_major_corr,
                )
            block_args = (
                net,
                inp,
                corr.astype(mdl.cfg.dtype),
                flow.astype(mdl.cfg.dtype),
            )
            if mdl.cfg.gma:
                net, up_mask, delta = block(*block_args, attention)
            else:
                net, up_mask, delta = block(*block_args)
            coords1 = coords1 + delta.astype(jnp.float32)
            flow_low = coords1 - coords0
            if final_flow_only:
                new_carry = (
                    (net, coords1, up_mask) if has_mask else (net, coords1)
                )
                return new_carry, flow_low
            if up_mask is None:
                # small model: bilinear x8 upsample (the reference raises here,
                # raft/__init__.py:167-168 — we keep the small variant usable)
                flow_up = resize_flow(flow_low, out_size, scaling=True)
                if crop is not None:
                    from flow_supervisor_tpu.ops.pad import crop_bboxes

                    flow_up = crop_bboxes(flow_up, crop[0] * 8, crop[2])
            elif crop is not None:
                flow_up = (
                    _crop_upsample(
                        flow_low, up_mask.astype(jnp.float32), *crop
                    )
                    * 8.0
                )
            else:
                flow_up = (
                    upsample_convex(flow_low, up_mask.astype(jnp.float32), out_size)
                    * 8.0
                )
            return (net, coords1), (flow_up, flow_low)

        carry0 = (net, coords1)
        if final_flow_only and has_mask:
            b, h8, w8 = coords1.shape[0], coords1.shape[1], coords1.shape[2]
            carry0 = (net, coords1, jnp.zeros((b, h8, w8, 576), self.cfg.dtype))

        if self.cfg.scan_iters:
            scan = nn.scan(
                step,
                variable_broadcast="params",
                split_rngs={"params": False},
                length=iters,
            )
            carry, ys = scan(self, carry0, None)
        else:
            ys_list = []
            carry = carry0
            for _ in range(iters):
                carry, y = step(self, carry, None)
                ys_list.append(y)
            ys = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ys_list)

        if final_flow_only:
            net, coords1 = carry[0], carry[1]
            lows = ys
            flow_low = coords1 - coords0
            if has_mask and crop is not None:
                flow_up = (
                    _crop_upsample(flow_low, carry[2].astype(jnp.float32), *crop)
                    * 8.0
                )
            elif has_mask:
                flow_up = (
                    upsample_convex(
                        flow_low, carry[2].astype(jnp.float32), out_size
                    )
                    * 8.0
                )
            else:
                flow_up = resize_flow(flow_low, out_size, scaling=True)
                if crop is not None:
                    from flow_supervisor_tpu.ops.pad import crop_bboxes

                    flow_up = crop_bboxes(flow_up, crop[0] * 8, crop[2])
            return net, coords1, flow_up[None], lows

        net, coords1 = carry
        ups, lows = ys
        return net, coords1, ups, lows

    def build_corr(self, fmap1, fmap2):
        """Correlation pyramid via pooled feature maps (linear-pooling identity;
        see ops/corr.py build_corr_pyramid_from_fmaps). The backward direction
        is build_corr(fmap2, fmap1) — no 5-D volume transpose.

        With lookup_backend="pallas" the pyramid is stored as zero-padded
        per-query planes (padded ONCE per forward) for the fused window
        kernel; "plane" additionally lane-packs sub-128-lane levels into
        shared 128-lane groups (halves plane DMA bytes, kernels/corr_plane.py).
        """
        if self.cfg.lookup_backend == "plane":
            from flow_supervisor_tpu.kernels.corr_plane import (
                build_packed_pyramid,
            )

            return build_packed_pyramid(
                fmap1.astype(self.cfg.dtype),
                fmap2.astype(self.cfg.dtype),
                self.cfg.corr_levels,
                self.cfg.corr_radius,
                self.cfg.corr_dtype,
            )
        if self.cfg.lookup_backend == "pallas":
            from flow_supervisor_tpu.kernels.corr_lookup_v2 import (
                build_padded_pyramid,
            )

            return build_padded_pyramid(
                fmap1.astype(self.cfg.dtype),
                fmap2.astype(self.cfg.dtype),
                self.cfg.corr_levels,
                self.cfg.corr_radius,
                self.cfg.corr_dtype,
            )
        if self.cfg.lookup_backend == "fused":
            from flow_supervisor_tpu.kernels.corr_fused import (
                build_fused_pyramid,
            )

            return build_fused_pyramid(
                fmap1.astype(self.cfg.dtype),
                fmap2.astype(self.cfg.dtype),
                self.cfg.corr_levels,
                self.cfg.corr_radius,
            )
        from flow_supervisor_tpu.ops.corr import build_corr_pyramid_from_fmaps

        return build_corr_pyramid_from_fmaps(
            fmap1.astype(self.cfg.dtype),
            fmap2.astype(self.cfg.dtype),
            self.cfg.corr_levels,
            self.cfg.corr_dtype,
        )

    # ---- standard forward -------------------------------------------------

    def __call__(
        self,
        image1,
        image2,
        flow_init: Optional[jax.Array] = None,
        train: bool = False,
        iters: Optional[int] = None,
        final_flow_only: bool = False,
    ):
        cfg = self.cfg
        iters = cfg.iters if iters is None else iters
        b, h, w, _ = image1.shape

        fmap1, fmap2 = self.features(image1, image2, train)
        corr_pyramid = self.build_corr(fmap1, fmap2)
        net, inp = self.context(image1, train)

        h8, w8 = downsample_shape(h), downsample_shape(w)
        coords0 = coords_grid(b, h8, w8)
        coords1 = coords0
        if flow_init is not None:
            coords1 = coords1 + resize_flow(
                flow_init.astype(jnp.float32), (h8, w8), scaling=True
            )

        net, coords1, flows_up, flows_low = self.iterate(
            net, inp, corr_pyramid, coords0, coords1, (h, w), iters,
            attention=self.attention_map(inp),
            final_flow_only=final_flow_only,
        )
        return {"flow_up": flows_up, "flow_low": flows_low}

    def teacher_iterate(
        self, net, inp, corr_pyramid, coords0, coords1, out_size, iters: int
    ):
        """Continue refinement with the teacher head (reference semi.py:47-77)."""
        return self.iterate(
            net, inp, corr_pyramid, coords0, coords1, out_size, iters, teacher=True
        )

    # ---- flow-supervisor forward (reference Semisupervised.call, semi.py:152-303)

    def _directional(
        self, image1, corr_pyramid, teacher_pyramid, teacher_image1,
        crop_yx8, crop_yx, train, teacher_final_only: bool = False,
    ):
        """One direction of the semi forward: student on the crop, teacher
        continuing from the student's final state in full-image coordinates.

        ``teacher_final_only``: upsample only the teacher's LAST iteration
        (the L_fr target is the stop-gradient final prediction, reference
        semi.py:447-471 — under ``scan_iters`` the other 11 full-res convex
        upsamples cannot be dead-code-eliminated, so skip them explicitly).
        """
        from flow_supervisor_tpu.ops.pad import pad_bboxes

        cfg = self.cfg
        b, h, w, _ = image1.shape
        fh, fw = teacher_image1.shape[1], teacher_image1.shape[2]
        h8, w8 = downsample_shape(h), downsample_shape(w)
        fh8, fw8 = downsample_shape(fh), downsample_shape(fw)

        net, inp = self.context(image1, train)
        coords0 = coords_grid(b, h8, w8)
        net, _, stu_up, stu_low = self.iterate(
            net, inp, corr_pyramid, coords0, coords0, (h, w), cfg.iters,
            attention=self.attention_map(inp),
        )

        # Teacher state: student hidden/flow zero-padded into full coords
        # (semi.py:215-233), teacher context from the FULL image with
        # stop-gradient (semi.py:52-54), all-stop-gradient corr volume.
        t_net = pad_bboxes(jax.lax.stop_gradient(net), crop_yx8, (fh8, fw8))
        t_flow = pad_bboxes(
            jax.lax.stop_gradient(stu_low[-1]), crop_yx8, (fh8, fw8)
        )
        _, t_inp = self.context(teacher_image1, train)
        t_inp = jax.lax.stop_gradient(t_inp)
        t_coords0 = coords_grid(b, fh8, fw8)

        t_attention = self.attention_map(t_inp)
        if t_attention is not None:
            t_attention = jax.lax.stop_gradient(t_attention)
        # Teacher predictions are only ever consumed in the student's frame
        # (semi.py:239-248): upsample the crop window directly at crop
        # resolution instead of upsampling the full frame and cropping —
        # bit-identical (see iterate docstring), ~35% less convex-upsample
        # work at recipe shapes, and no [iters, B, fh, fw, 2] stack in HBM.
        _, _, tea_up, tea_low = self.iterate(
            t_net,
            t_inp,
            teacher_pyramid,
            t_coords0,
            t_coords0 + t_flow,
            (fh, fw),
            cfg.teacher_iters,
            teacher=True,
            attention=t_attention,
            final_flow_only=teacher_final_only,
            crop=(crop_yx8, (h8, w8), (h, w)),
        )
        return stu_up, stu_low, tea_up, tea_low

    def semi_forward(
        self,
        image1,
        image2,
        orig_image1,
        orig_image2,
        crop_yx,  # [B, 2] int (y, x), multiples of 8 (augmentor guarantees)
        train: bool = False,
        use_bw: bool = True,
        teacher_final_only: bool = False,
    ):
        """Teacher-student forward for the flow supervisor.

        Returns dict with stacked predictions:
          student_fw/bw: [iters, B, h, w, 2], teacher_fw/bw: [t_iters, B, h, w, 2]
          (cropped into the student frame; length 1 when ``teacher_final_only``),
          plus full-frame low-res teacher flows (teacher_low_fw/bw).
        """
        fmap1, fmap2 = self.features(image1, image2, train)
        corr_pyramid = self.build_corr(fmap1, fmap2)
        tf1, tf2 = self.features(orig_image1, orig_image2, train)
        teacher_pyramid = jax.lax.stop_gradient(self.build_corr(tf1, tf2))

        crop_yx = crop_yx.astype(jnp.int32)
        crop_yx8 = crop_yx // 8

        stu_fw, stu_low_fw, tea_fw, tea_low_fw = self._directional(
            image1, corr_pyramid, teacher_pyramid, orig_image1,
            crop_yx8, crop_yx, train, teacher_final_only,
        )
        out = {
            "student_fw": stu_fw,
            "student_low_fw": stu_low_fw,
            "teacher_fw": tea_fw,
            "teacher_low_fw": tea_low_fw,
        }
        if use_bw:
            bw_pyramid = self.build_corr(fmap2, fmap1)
            t_bw_pyramid = jax.lax.stop_gradient(self.build_corr(tf2, tf1))
            stu_bw, stu_low_bw, tea_bw, tea_low_bw = self._directional(
                image2, bw_pyramid, t_bw_pyramid, orig_image2,
                crop_yx8, crop_yx, train, teacher_final_only,
            )
            out.update(
                student_bw=stu_bw,
                student_low_bw=stu_low_bw,
                teacher_bw=tea_bw,
                teacher_low_bw=tea_low_bw,
            )
        return out

    def unsup_forward(self, image1, image2, train: bool = False, use_bw: bool = True):
        """Bidirectional student forward (reference Unsupervised.call,
        unsup.py:96-130); the backward pyramid swaps the fmap arguments instead
        of transposing the 5-D volume."""
        b, h, w, _ = image1.shape
        h8, w8 = downsample_shape(h), downsample_shape(w)
        fmap1, fmap2 = self.features(image1, image2, train)
        corr_pyramid = self.build_corr(fmap1, fmap2)
        net, inp = self.context(image1, train)
        coords0 = coords_grid(b, h8, w8)
        _, _, fw_up, fw_low = self.iterate(
            net, inp, corr_pyramid, coords0, coords0, (h, w), self.cfg.iters,
            attention=self.attention_map(inp),
        )
        out = {"flow_up": fw_up, "flow_low": fw_low}
        if use_bw:
            bw_pyramid = self.build_corr(fmap2, fmap1)
            net2, inp2 = self.context(image2, train)
            _, _, bw_up, bw_low = self.iterate(
                net2, inp2, bw_pyramid, coords0, coords0, (h, w), self.cfg.iters,
                attention=self.attention_map(inp2),
            )
            out.update(flow_up_bw=bw_up, flow_low_bw=bw_low)
        return out
