"""Gradient balancing: scale the forward value, keep the backward gradient.

The paper (arXiv:2007.11679 §3.2) rescales key coordinates from [-1, 1] to grid
units in the forward pass but keeps the gradient magnitude of the *normalized*
coordinates, so that the learning rate of key prediction is independent of the
grid resolution.  Reference behavior: /root/reference/layers/cloud_transform.py:12-26
(forward: ``input * scale``; backward: identity on ``grad_output``).
"""

import jax


@jax.custom_vjp
def balance_op(x, scale):
    """Forward ``x * scale``; backward passes the cotangent through unscaled."""
    return x * scale


def _balance_fwd(x, scale):
    return x * scale, None


def _balance_bwd(_, g):
    # Gradient wrt x is the unscaled cotangent; scale gets no gradient.
    return g, None


balance_op.defvjp(_balance_fwd, _balance_bwd)
