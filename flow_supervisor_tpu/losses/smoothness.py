"""Edge-aware smoothness losses.

Parity with the reference (``raft/smurf_models/smurf_utils.py:363-429``):
first/second-order flow gradients weighted by an image-gradient edge weight
(gaussian: exp(-mean((c*g)^2)), exponential: exp(-mean|c*g|); the flagship recipe
uses 'exponential' with constant 150, raft/unsup_loss.py:80-81), with robust_l1
(Charbonnier) on the flow gradients, averaged over x and y terms.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from flow_supervisor_tpu.losses.photometric import robust_l1


def image_grads(image: jax.Array, stride: int = 1):
    gh = image[:, stride:] - image[:, :-stride]
    gw = image[:, :, stride:] - image[:, :, :-stride]
    return gh, gw


def edge_weighting_fn(kind: str, constant: float) -> Callable:
    if kind == "gaussian":
        return lambda x: jnp.exp(
            -jnp.mean(jnp.square(constant * x), axis=-1, keepdims=True)
        )
    if kind == "exponential":
        return lambda x: jnp.exp(
            -jnp.mean(jnp.abs(constant * x), axis=-1, keepdims=True)
        )
    raise ValueError("only gaussian or exponential edge weighting implemented")


def first_order_smoothness_loss(image, flow, edge_fn) -> jax.Array:
    img_gh, img_gw = image_grads(image)
    w_h, w_w = edge_fn(img_gh), edge_fn(img_gw)
    flow_gh, flow_gw = image_grads(flow)
    return (
        jnp.mean(w_h * robust_l1(flow_gh)) + jnp.mean(w_w * robust_l1(flow_gw))
    ) / 2.0


def second_order_smoothness_loss(image, flow, edge_fn) -> jax.Array:
    img_gh, img_gw = image_grads(image, stride=2)
    w_hh, w_ww = edge_fn(img_gh), edge_fn(img_gw)
    flow_gh, flow_gw = image_grads(flow)
    flow_ghh, _ = image_grads(flow_gh)
    _, flow_gww = image_grads(flow_gw)
    return (
        jnp.mean(w_hh * robust_l1(flow_ghh)) + jnp.mean(w_ww * robust_l1(flow_gww))
    ) / 2.0
