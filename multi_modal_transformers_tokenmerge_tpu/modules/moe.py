"""Mixture-of-experts MLP block with expert parallelism (EP).

The reference has no MoE (and no parallelism at all — SURVEY.md §2 rows
23-24); this is a forward-looking capability of the TPU framework: a
drop-in replacement for the encoder block's dense MLP
(reference: attention_blocks/attention.py:20-39) that scales FLOPs
without scaling per-token cost, sharded expert-parallel over the mesh's
``model`` axis.

TPU-first design (GShard/Switch-style *dense dispatch*):

* routing produces static-shape one-hot dispatch/combine tensors
  ``(B, S, E, C)`` — no ragged gathers, no dynamic shapes; the dispatch,
  expert, and combine steps are three einsums that all land on the MXU;
* the router runs in float32 regardless of the compute dtype (softmax
  over expert logits is precision-sensitive);
* capacity is slot-major: every token's first choice is granted capacity
  before any token's second choice (GShard ordering);
* tokens overflowing an expert's capacity contribute zero here and fall
  through to the block's residual path;
* expert parameters are stacked ``(E, ...)`` so expert parallelism is
  just a PartitionSpec on the leading axis (``parallel/mesh.py`` rules) —
  XLA inserts the all-to-alls implied by resharding ``ebcd`` operands;
* the Switch load-balancing auxiliary loss is returned (and sown by
  ``TransformerStack`` under ``'losses'``) so the gate learns to spread
  load; ``moe_aux_loss`` extracts it from mutated variables.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import MoEConfig

__all__ = ["MoEMLPBlock", "moe_aux_loss"]

_kernel_init = nn.initializers.he_normal()
_bias_init = nn.initializers.normal()


def moe_capacity(cfg: MoEConfig, seq_len: int) -> int:
    """Per-expert token capacity C for a sequence of S tokens."""
    c = cfg.top_k * seq_len * cfg.capacity_factor / cfg.num_experts
    return max(1, int(-(-c // 1)))  # ceil


class MoEMLPBlock(nn.Module):
    """Routed two-layer MLP: ``combine(expert_mlp(dispatch(x)))``.

    Returns ``(y, aux)`` where ``aux`` is the scalar Switch load-balance
    loss (E * sum_e fraction_e * mean_prob_e; 1.0 when perfectly uniform).
    """

    cfg: MoEConfig
    mlp_dim: int
    out_dim: int
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        b, s, d = x.shape
        e, k = c.num_experts, c.top_k
        cap = moe_capacity(c, s)
        act = getattr(nn, self.activation)

        # --- router (float32 math) ---
        logits = nn.Dense(e, use_bias=False, dtype=jnp.float32,
                          param_dtype=jnp.float32,
                          kernel_init=nn.initializers.normal(1e-2),
                          name="router")(x.astype(jnp.float32))
        if not deterministic and c.router_noise > 0.0:
            u = jax.random.uniform(self.make_rng("dropout"), logits.shape,
                                   jnp.float32, 1.0 - c.router_noise,
                                   1.0 + c.router_noise)
            logits = logits * u
        probs = jax.nn.softmax(logits, axis=-1)             # (B, S, E)
        gate, idx = jax.lax.top_k(probs, k)                 # (B, S, k)
        if k > 1:
            gate = gate / jnp.sum(gate, axis=-1, keepdims=True)

        # --- capacity assignment, slot-major (GShard ordering) ---
        sel = jax.nn.one_hot(idx, e, dtype=jnp.float32)     # (B, S, k, E)
        # order rows (slot, position): all 1st choices before 2nd choices
        sel_flat = sel.transpose(0, 2, 1, 3).reshape(b, k * s, e)
        pos_flat = jnp.cumsum(sel_flat, axis=1) - sel_flat  # rank in expert
        keep_flat = sel_flat * (pos_flat < cap)
        pos = (pos_flat.reshape(b, k, s, e).transpose(0, 2, 1, 3))
        keep = keep_flat.reshape(b, k, s, e).transpose(0, 2, 1, 3)

        # (B, S, k, E, C) one-hot over capacity slots, zero if overflowed
        slot = jax.nn.one_hot(pos.astype(jnp.int32), cap,
                              dtype=jnp.float32) * keep[..., None]
        dispatch = jnp.sum(slot, axis=2)                    # (B, S, E, C)
        combine = jnp.einsum("bsk,bskec->bsec", gate.astype(jnp.float32),
                             slot)                          # (B, S, E, C)

        # --- expert computation: three MXU einsums ---
        wi = self.param("expert_wi", _kernel_init, (e, d, self.mlp_dim),
                        self.param_dtype)
        bi = self.param("expert_bi", _bias_init, (e, self.mlp_dim),
                        self.param_dtype)
        wo = self.param("expert_wo", _kernel_init, (e, self.mlp_dim, self.out_dim),
                        self.param_dtype)
        bo = self.param("expert_bo", _bias_init, (e, self.out_dim),
                        self.param_dtype)

        xin = jnp.einsum("bsec,bsd->ebcd", dispatch.astype(self.dtype),
                         x.astype(self.dtype))              # (E, B, C, D)
        h = act(jnp.einsum("ebcd,edf->ebcf", xin, wi.astype(self.dtype))
                + bi.astype(self.dtype)[:, None, None, :])
        out = (jnp.einsum("ebcf,efd->ebcd", h, wo.astype(self.dtype))
               + bo.astype(self.dtype)[:, None, None, :])
        y = jnp.einsum("bsec,ebcd->bsd", combine.astype(self.dtype), out)

        # --- Switch load-balance aux (pre-capacity top-1 fractions) ---
        top1 = sel[:, :, 0, :]                              # (B, S, E)
        frac = jnp.mean(top1, axis=(0, 1))                  # tokens / expert
        mean_prob = jnp.mean(probs, axis=(0, 1))
        aux = e * jnp.sum(frac * mean_prob)
        return y.astype(self.dtype), aux.astype(jnp.float32)


def moe_aux_loss(mutated_variables, weight: float = 1.0) -> jax.Array:
    """Total MoE auxiliary loss from ``mutable=['losses']`` output.

    ``TransformerStack`` sows one ``moe_aux`` entry per stack, ALREADY
    weighted by its ``cfg.moe.aux_loss_weight`` — entries in 'losses' are
    ready-to-add objective terms.  ``weight`` (default 1.0) is an extra
    global scale for custom setups.  This flattens whatever is present so
    nested/multiple stacks also work.  The standard train step
    (train/steps.py make_train_step) adds this automatically.
    """
    losses = mutated_variables.get("losses", {})
    leaves = jax.tree_util.tree_leaves(losses)
    if not leaves:
        return jnp.zeros((), jnp.float32)
    return weight * sum(jnp.sum(leaf) for leaf in leaves)
