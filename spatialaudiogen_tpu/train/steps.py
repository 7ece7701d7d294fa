"""Sharded, jitted train/eval steps.

The batch dict carries the feeder outputs (feeder.py:323-335 names):
  ambix      (B, snd_size, num_ambi_channels)   float32
  audio_mask (B, num_ambi_channels)             float32
  video/flow (B, vid_dur, H, W, 3)              float32   [if encoders use them]

Input/target slicing happens inside the step (train.py:107-111): the first
order^2 channels are the model input, channels [order^2:] of the center
prediction window are the target.

Steps are jax.jit'ed with NamedSharding annotations: batch sharded over the
'data' mesh axis, params sharded per parallel.mesh.param_sharding_specs
(replicated + optional tensor-parallel wide FCs). XLA GSPMD inserts the
gradient reductions; the same step runs on 1 chip or a full mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from spatialaudiogen_tpu.models import SptAudioGen
from spatialaudiogen_tpu.models.metrics import evaluation_metrics, training_loss
from spatialaudiogen_tpu.parallel.mesh import param_sharding_specs, specs_to_shardings
from spatialaudiogen_tpu.train.state import TrainState


def _split_batch(batch: dict, cfg):
    g = cfg.geometry
    n_in = g.num_in_channels
    ambix = batch["ambix"]
    audio_in = ambix[:, :, :n_in]
    target = ambix[:, g.target_ss: g.target_ss + g.snd_dur, n_in:]
    mask = batch["audio_mask"][:, n_in:]
    video, flow = batch.get("video"), batch.get("flow")
    if video is not None and video.dtype == jnp.uint8:
        # u8 transport (readers.img_prep_u8): the feeder ships raw frames at
        # a quarter of the f32 bytes and the prep (myutils.py:88-89) runs
        # here, fused into the first conv's input chain by XLA
        video = video.astype(jnp.float32) / 255.0 - 0.5
    return audio_in, video, flow, target, mask


def make_train_step(model: SptAudioGen, tx, weight_decay: float = 5e-4):
    cfg = model.cfg

    def train_step(state: TrainState, batch: dict):
        audio_in, video, flow, target, mask = _split_batch(batch, cfg)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                pred, updated = model.apply(variables, audio_in, video, flow,
                                            train=True, mutable=["batch_stats"])
                new_stats = updated.get("batch_stats", state.batch_stats)
            else:
                pred = model.apply(variables, audio_in, video, flow, train=True)
                new_stats = state.batch_stats
            total, metrics = training_loss(
                pred, target, mask, cfg.audio_rate, params=params,
                weight_decay=weight_decay, decay_exclude=model.no_decay_paths(),
                precision=cfg.dft_precision)
            return total, (metrics, new_stats)

        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt)
        return new_state, metrics

    return train_step


def make_observe_step(model: SptAudioGen, weight_decay: float = 5e-4,
                      with_ends: bool = False):
    """Gradient (and optionally tapped-activation) snapshot for TB
    histograms — the reference's verbosity-gated grad/activation summaries
    (reference pyutils/tflib/dnn.py:692-709). Runs one extra fwd+bwd on the
    current batch WITHOUT updating state; only built/dispatched on
    --tb_histograms steps, so the steady-state step loop pays nothing.
    """
    cfg = model.cfg

    def observe_step(state: TrainState, batch: dict):
        audio_in, video, flow, target, mask = _split_batch(batch, cfg)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                out, _ = model.apply(variables, audio_in, video, flow,
                                     train=True, return_ends=with_ends,
                                     mutable=["batch_stats"])
            else:
                out = model.apply(variables, audio_in, video, flow,
                                  train=True, return_ends=with_ends)
            pred, ends = out if with_ends else (out, {})
            total, _ = training_loss(
                pred, target, mask, cfg.audio_rate, params=params,
                weight_decay=weight_decay, decay_exclude=model.no_decay_paths(),
                precision=cfg.dft_precision)
            return total, ends

        grads, ends = jax.grad(loss_fn, has_aux=True)(state.params)
        return grads, ends

    return observe_step


def make_eval_step(model: SptAudioGen):
    cfg = model.cfg

    def eval_step(state: TrainState, batch: dict):
        audio_in, video, flow, target, mask = _split_batch(batch, cfg)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        pred = model.apply(variables, audio_in, video, flow, train=False)
        metrics, per_sample = evaluation_metrics(pred, target, mask, cfg.audio_rate,
                                                 precision=cfg.dft_precision)
        mono = audio_in[:, cfg.geometry.target_ss:
                        cfg.geometry.target_ss + cfg.geometry.snd_dur]
        return pred, mono, target, metrics, per_sample

    return eval_step


def state_shardings(state: TrainState, tx, mesh):
    """NamedSharding tree for a TrainState: params per the TP rules, Adam
    moments following their parameters, everything else replicated."""
    pspecs = param_sharding_specs(state.params, mesh)
    pshard = specs_to_shardings(pspecs, mesh)
    rep = NamedSharding(mesh, P())
    opt_sh = optax.tree_map_params(tx, lambda _, s: s, state.opt_state, pshard,
                                   transform_non_params=lambda _: rep)
    return TrainState(
        step=rep,
        params=pshard,
        batch_stats=jax.tree_util.tree_map(lambda _: rep, state.batch_stats),
        opt_state=opt_sh,
    )


def jit_sharded(step_fn, state: TrainState, tx, mesh, donate_state: bool = True):
    """jit a (state, batch) step with mesh shardings derived from `state`.

    The caller device_puts each batch with parallel.mesh.batch_sharding(mesh);
    the batch argument's sharding then flows through jit unchanged.

    out_shardings pins the NEW state to the same shardings as the input
    state: without it GSPMD is free to emit some state leaf with a
    propagated sharding (observed: a replicated Adam moment coming back
    P('model') on a (4,2) mesh), which fails the in_shardings check on the
    second step of the loop. step_fn must return (new_state, aux).
    """
    shardings = state_shardings(state, tx, mesh)
    jitted = jax.jit(step_fn, in_shardings=(shardings, None),
                     out_shardings=(shardings, None),
                     donate_argnums=(0,) if donate_state else ())
    return jitted, shardings
