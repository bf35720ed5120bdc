"""On-device PPO learner.

Replaces the reference's SB3 PPO + SubprocVecEnv stack
(reference: train_balatro_agent.py:269-461, hpc_train.py:39-152): instead of
N worker processes stepping Python envs over pipes into a torch learner, the
envs are a vmapped pytree and the WHOLE loop — rollout (lax.scan of jitted env
steps + policy), GAE, minibatched clipped-PPO updates — is one compiled XLA
program with zero host round-trips.

Hyperparameter defaults mirror the reference's PPO table
(train_balatro_agent.py:326-344: lr 3e-4, n_steps 2048→here per-env horizon,
gamma 0.99, gae_lambda 0.95, clip 0.2, ent 0.01, vf 0.5, 10 epochs).

The learner is environment-generic: it takes an ``EnvHooks`` bundle of pure
functions (reset / step_autoreset / observe / action_mask), so the same code
trains on SimEnv today and the full flagship env later.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from balatro_gym_tpu.train.networks import ActorCritic, StructuredActorCritic
from balatro_gym_tpu.train.normalize import (
    RunningStats, init_stats, normalize, normalize_reward, update_stats)


class EnvHooks(NamedTuple):
    """Pure-function env interface (all single-env; vmapped internally)."""

    reset: Callable[..., Any]          # key -> state
    step_autoreset: Callable[..., Any]  # (state, action) -> (state, reward, done)
    observe: Callable[..., Any]        # state -> [D] f32
    action_mask: Callable[..., Any]    # state -> [A] bool
    n_actions: int
    obs_dim: int
    # Optional non-autoreset step: done lanes freeze instead of resetting.
    # evaluate_policy prefers it so terminal-step ante advances are counted.
    step: Any = None


@struct.dataclass
class PPOConfig:
    n_envs: int = 1024
    rollout_len: int = 16
    epochs: int = 4
    minibatches: int = 4
    lr: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    ent_coef: float = 0.01
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    # Linear schedules over ``total_updates`` (0 = constant lr/ent_coef —
    # the r03 behavior). The round-3 verdict flagged the ante plateau with
    # "entropy still 1.23 after 3000 updates; no lr decay has been tried"
    # (reference anchor: train_progressive.py's whole point is breaking
    # plateaus): decaying ent_coef lets the policy commit, decaying lr
    # stabilizes the late run.
    total_updates: int = 0
    ent_coef_final: float = -1.0   # <0 = no decay
    lr_final: float = -1.0         # <0 = no decay
    # KL trust region (SB3 ``target_kl`` semantics,
    # stable_baselines3 PPO.train: if approx_kl > 1.5*target_kl, stop this
    # update's remaining minibatch steps BEFORE applying the offending one).
    # The round-4 8k-update run collapsed after ~update 3000 (entropy
    # climbed back to 2.0, training reward fell — docs/ROUND4.md §6): a few
    # outsized late-run policy steps destroy the policy faster than the
    # clipped objective can bound. Early-stopping on the Schulman
    # approx-KL estimate mean((ratio-1) - log ratio) caps per-update
    # divergence at its source. 0 = disabled. The threshold compared
    # against is ``kl_target`` itself (set 1.5x your target to mirror SB3).
    kl_target: float = 0.0
    # TRAIN-TIME anti-livelock shaping: subtract this from the TRAINING
    # reward when a lane repeats its previous action without scoring
    # (reward <= 0). Deterministic argmax policies otherwise learn
    # zero-reward select-toggle cycles that the r03 eval papered over with
    # the eval-side greedy_antiloop mask (#B13); penalizing repeats during
    # training removes the livelock at its source so plain greedy decode
    # works. Metrics/raw rewards are unaffected (shaping-only, like
    # train/progression.py).
    repeat_penalty: float = 0.0
    # TRAIN-TIME anti-livelock, round-5 (the repeat_penalty above is the
    # r04 negative result: 2-cycles evade a 1-step check). This is the
    # train-time twin of the #B13 eval mask: each lane carries a bitset of
    # actions taken since its last POSITIVE-reward step; re-taking one
    # while still scoreless costs ``cycle_penalty`` (shaping only — raw
    # rewards/metrics unaffected). Catches k-cycles of any length: a cycle
    # must eventually re-enter its own action set without scoring. The
    # bitset resets on positive reward or episode end.
    cycle_penalty: float = 0.0
    # Re-reset ALL training envs every N updates (0 = never). The
    # reference's trainer caps episodes at 1000 steps + 50 invalid actions
    # (SafeBalatroEnv, train_balatro_fixed.py:231,289) — our persistent
    # lanes have no cap, and the r05 kl_16k run showed why one exists:
    # lanes wedge into zero-reward livelock basins (training reward
    # pinned at exactly 0 from ~update 6500) while the POLICY itself stays
    # healthy (the same checkpoint's fresh-episode eval reads sampled ante
    # 16). Resetting before the rollout truncates wedged lanes like a
    # time limit; N*rollout_len is the effective per-lane episode cap
    # (N=32 at rollout 64 ~= 2048 steps, the same order as the
    # reference's cap).
    reset_envs_every: int = 0
    hidden: tuple = (256, 256)
    # VecNormalize-equivalent running normalization (hpc_train.py:68-72).
    normalize_obs: bool = True
    normalize_reward: bool = True
    # bf16 matmuls for the policy net (MXU-native); params stay f32.
    bf16_compute: bool = False
    # Collect rollouts through the single-step fused Pallas kernel
    # (ops/fused_policy_rollout.py): the env step runs in-kernel and the
    # policy runs feature-major on the MXU, ~40x the jnp collection path.
    # Flagship full env only; requires a TPU (Mosaic). The learner update is
    # unchanged — only the env side of the rollout moves into the kernel.
    fused_rollout: bool = False
    # Run the fused-collection pallas_call in interpret mode (plain XLA ops,
    # no Mosaic) — lets fused_rollout run on CPU meshes (tests, dryruns)
    # where the Mosaic backend is unavailable. Slow; testing only.
    fused_interpret: bool = False
    # Three-branch features extractor (the reference's
    # BalatroFeaturesExtractor intent, train_balatro_agent.py:42-119 —
    # see networks.StructuredActorCritic; its own version cannot run).
    # Flagship-env obs layout only. Works with fused_rollout (the
    # feature-major twin ops.fused_policy_rollout.policy_apply_structured_fm
    # runs the three branches MXU-transposed and concatenates on the
    # feature axis).
    structured_net: bool = False
    # Shuffle minibatches by permuting the ENV axis (contiguous [T,...]-row
    # gather, ~1 ms) instead of a full flat-batch row permutation (random
    # 820-byte rows — measured 12.7 ms/epoch at 524k samples on v5e).
    # Minibatches are sliced along the PERMUTED env axis (each minibatch =
    # all timesteps x a random env subset), so composition varies per
    # epoch/update and each minibatch spans the whole rollout horizon.
    # With thousands of i.i.d. env lanes per minibatch this is
    # statistically equivalent mixing to the flat permutation;
    # learning-curve-verified (docs/PERF.md round-4 PPO section).
    env_shuffle: bool = False


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    env_states: Any      # batched env pytree [n_envs, ...]
    key: jnp.ndarray
    update_idx: jnp.ndarray
    obs_stats: Any       # RunningStats over observations
    ret_stats: Any       # RunningStats over discounted returns (reward scale)
    ret_carry: jnp.ndarray  # [n_envs] running discounted return


class Transition(NamedTuple):
    obs: jnp.ndarray
    mask: jnp.ndarray
    action: jnp.ndarray
    log_prob: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray


def make_ppo(hooks: EnvHooks, cfg: PPOConfig):
    """Build (init_fn, update_fn, policy_fn) closures for one PPO run.

    init_fn(key) -> TrainState
    update_fn(TrainState) -> (TrainState, metrics dict)   [pure; jit/shard_map it]
    policy_fn(params, obs, mask) -> (logits, value)
    """
    if cfg.env_shuffle:
        assert cfg.n_envs % cfg.minibatches == 0, \
            "env_shuffle slices minibatches along the env axis: " \
            f"n_envs={cfg.n_envs} % minibatches={cfg.minibatches}"
    dt = jnp.bfloat16 if cfg.bf16_compute else None
    if cfg.structured_net:
        net = StructuredActorCritic(n_actions=hooks.n_actions,
                                    compute_dtype=dt)
    else:
        net = ActorCritic(n_actions=hooks.n_actions, hidden=tuple(cfg.hidden),
                          compute_dtype=dt)
    if cfg.lr_final >= 0.0 and cfg.total_updates > 0:
        lr = optax.linear_schedule(
            cfg.lr, cfg.lr_final,
            cfg.total_updates * cfg.epochs * cfg.minibatches)
    else:
        lr = cfg.lr
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(lr, eps=1e-5),
    )

    def init_fn(key):
        k_net, k_env, k_run = jax.random.split(key, 3)
        dummy_obs = jnp.zeros((1, hooks.obs_dim), jnp.float32)
        dummy_mask = jnp.ones((1, hooks.n_actions), bool)
        params = net.init(k_net, dummy_obs, dummy_mask)
        env_states = jax.vmap(hooks.reset)(jax.random.split(k_env, cfg.n_envs))
        return TrainState(
            params=params, opt_state=tx.init(params), env_states=env_states,
            key=k_run, update_idx=jnp.int32(0),
            obs_stats=init_stats(hooks.obs_dim), ret_stats=init_stats(),
            ret_carry=jnp.zeros(cfg.n_envs, jnp.float32),
        )

    def _policy_step(params, env_states, key, obs_stats):
        obs = jax.vmap(hooks.observe)(env_states)
        if cfg.normalize_obs:
            obs = normalize(obs_stats, obs)
        mask = jax.vmap(hooks.action_mask)(env_states)
        logits, value = net.apply(params, obs, mask)
        action = jax.random.categorical(key, logits)
        log_prob = jnp.take_along_axis(
            jax.nn.log_softmax(logits), action[:, None], axis=-1)[:, 0]
        return obs, mask, action, log_prob, value

    def _shape(reward, action, prev_a):
        """Anti-livelock repeat penalty (training reward only)."""
        if not cfg.repeat_penalty:
            return reward
        rep = (action == prev_a) & (reward <= 0.0)
        return reward - cfg.repeat_penalty * rep.astype(jnp.float32)

    def _cycle_shape(train_reward, raw, action, done, alo, ahi):
        """Since-last-reward action-set penalty (PPOConfig.cycle_penalty).

        Applied in TRAINING-REWARD units, i.e. AFTER reward normalization:
        the flagship's return std is in the thousands, so a pre-norm
        penalty divides to ~nothing (measured: cycle_penalty=0.05 pre-norm
        left plain-argmax livelock untouched, docs/livelock_r05.json).
        Cycle detection gates on the RAW reward (scoreless steps).
        Returns (shaped train reward, new bitset lo, new bitset hi)."""
        if not cfg.cycle_penalty:
            return train_reward, alo, ahi
        a = action.astype(jnp.uint32)
        sh = a & jnp.uint32(31)
        word = jnp.where(action < 32, alo, ahi)
        seen = ((word >> sh) & 1) != 0
        rep = seen & (raw <= 0.0)
        shaped = train_reward - cfg.cycle_penalty * rep.astype(jnp.float32)
        bit = jnp.uint32(1) << sh
        nlo = alo | jnp.where(action < 32, bit, jnp.uint32(0))
        nhi = ahi | jnp.where(action < 32, jnp.uint32(0), bit)
        reset = (raw > 0.0) | done
        z = jnp.uint32(0)
        return shaped, jnp.where(reset, z, nlo), jnp.where(reset, z, nhi)

    def _rollout(params, env_states, key, obs_stats, ret_stats, ret_carry):
        def body(carry, k):
            env_states, ret_carry, prev_a, alo, ahi = carry
            k_act, k_step = jax.random.split(k)
            obs, mask, action, log_prob, value = _policy_step(
                params, env_states, k_act, obs_stats)
            env_states, reward, done = jax.vmap(hooks.step_autoreset)(env_states, action)
            raw = reward.astype(jnp.float32)
            reward = _shape(raw, action, prev_a)
            ret_carry = ret_carry * cfg.gamma * (1.0 - done.astype(jnp.float32)) + reward
            train_reward = (normalize_reward(ret_stats, reward)
                            if cfg.normalize_reward else reward)
            train_reward, alo, ahi = _cycle_shape(train_reward, raw, action,
                                                  done, alo, ahi)
            # i32 regardless of x64 (categorical yields i64 there).
            prev_a = jnp.where(done, -1, action).astype(jnp.int32)
            t = Transition(obs, mask, action, log_prob, value, train_reward, done)
            return (env_states, ret_carry, prev_a, alo, ahi), (t, raw, ret_carry)

        prev0 = jnp.full(ret_carry.shape, -1, jnp.int32)
        bits0 = jnp.zeros(ret_carry.shape, jnp.uint32)
        (env_states, ret_carry, _, _, _), (traj, raw_rewards, rets) = jax.lax.scan(
            body, (env_states, ret_carry, prev0, bits0, bits0),
            jax.random.split(key, cfg.rollout_len))
        return env_states, traj, raw_rewards, rets, ret_carry

    def _rollout_fused(params, env_states, key, obs_stats, ret_stats,
                       ret_carry):
        """The same rollout contract as ``_rollout``, but the env step is
        the single-step fused Pallas kernel and the policy runs
        feature-major (envs on vector lanes — zero per-step transposes).
        Trajectories carry [T, features, envs] blocks through the scan and
        transpose ONCE at the end into ``_rollout``'s [T, envs, ...] layout.
        """
        from balatro_gym_tpu.ops import fused_policy_rollout as FP

        from balatro_gym_tpu.train.normalize import normalize_fm

        cards, ints, rng = FP.tile_packed(FP.pack_full_state(env_states))
        n_tiles = ints.shape[1]
        obs_fm, mask_fm = FP.observe_tiles(cards, ints, rng,
                                           interpret=cfg.fused_interpret)
        dt = jnp.bfloat16 if cfg.bf16_compute else None

        apply_fm = (FP.policy_apply_structured_fm if cfg.structured_net
                    else FP.policy_apply_fm)

        def body(carry, k):
            cards, ints, rng, obs_fm, mask_fm, ret_carry, prev_a, alo, ahi = carry
            obs2 = FP.flat_fm(obs_fm)
            if cfg.normalize_obs:
                obs2 = normalize_fm(obs_stats, obs2)
            mask2 = FP.flat_fm(mask_fm) != 0
            logits, value = apply_fm(params, obs2, mask2, compute_dtype=dt)
            action, log_prob = FP.sample_fm(k, logits)
            cards, ints, rng, rew, done, obs_fm, mask_fm = FP.step_tiles(
                cards, ints, rng, FP.unflat_fm(action[None], n_tiles),
                interpret=cfg.fused_interpret)
            raw = FP.flat_fm(rew)[0]
            done = FP.flat_fm(done)[0] != 0
            reward = _shape(raw, action, prev_a)
            prev_a = jnp.where(done, -1, action)
            ret_carry = (ret_carry * cfg.gamma * (1.0 - done.astype(jnp.float32))
                         + reward)
            train_reward = (normalize_reward(ret_stats, reward)
                            if cfg.normalize_reward else reward)
            train_reward, alo, ahi = _cycle_shape(train_reward, raw, action,
                                                  done, alo, ahi)
            # bf16 learners cast obs to bf16 at the first matmul anyway —
            # storing the trajectory obs in bf16 is numerically identical
            # for them and halves the store/gather/read traffic of the
            # biggest buffer in the update ([T, E, D] f32 = 396 MB at
            # 8192x64).
            obs_store = obs2.astype(dt) if dt is not None else obs2
            out = (obs_store, mask2, action, log_prob, value, train_reward,
                   raw, done, ret_carry)
            return (cards, ints, rng, obs_fm, mask_fm, ret_carry, prev_a,
                    alo, ahi), out

        prev0 = jnp.full(ret_carry.shape, -1, jnp.int32)
        bits0 = jnp.zeros(ret_carry.shape, jnp.uint32)
        carry, (obs_s, mask_s, act_s, lp_s, val_s, trew_s, rew_s, done_s,
                rets_s) = jax.lax.scan(
            body, (cards, ints, rng, obs_fm, mask_fm, ret_carry, prev0,
                   bits0, bits0),
            jax.random.split(key, cfg.rollout_len))
        cards, ints, rng, _, _, ret_carry, _, _, _ = carry
        env_states = FP.unpack_full_state(FP.untile_packed(cards, ints, rng))
        traj = Transition(obs=obs_s.transpose(0, 2, 1),
                          mask=mask_s.transpose(0, 2, 1),
                          action=act_s, log_prob=lp_s, value=val_s,
                          reward=trew_s, done=done_s)
        return env_states, traj, rew_s, rets_s, ret_carry

    if cfg.fused_rollout:
        from balatro_gym_tpu.ops import fused_policy_rollout as FP

        assert hooks.obs_dim == FP.OBS_DIM and hooks.n_actions == FP.N_ACTIONS, \
            "fused_rollout supports the flagship full env only"
        _rollout = _rollout_fused  # noqa: F811 - deliberate swap

    def _gae(traj: Transition, last_value):
        def body(carry, t):
            gae, next_value = carry
            nonterm = 1.0 - t.done.astype(jnp.float32)
            delta = t.reward + cfg.gamma * next_value * nonterm - t.value
            gae = delta + cfg.gamma * cfg.gae_lambda * nonterm * gae
            return (gae, t.value), gae

        (_, _), adv = jax.lax.scan(
            body, (jnp.zeros_like(last_value), last_value), traj, reverse=True)
        return adv, adv + traj.value

    def _loss(params, batch, ent_coef):
        t, adv, ret = batch
        logits, value = net.apply(params, t.obs, t.mask)
        log_all = jax.nn.log_softmax(logits)
        log_prob = jnp.take_along_axis(log_all, t.action[:, None], axis=-1)[:, 0]
        ratio = jnp.exp(log_prob - t.log_prob)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg1 = ratio * adv_n
        pg2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv_n
        pg_loss = -jnp.minimum(pg1, pg2).mean()
        v_clip = t.value + jnp.clip(value - t.value, -cfg.clip_eps, cfg.clip_eps)
        v_loss = 0.5 * jnp.maximum((value - ret) ** 2, (v_clip - ret) ** 2).mean()
        probs = jnp.exp(log_all)
        ent = -jnp.sum(jnp.where(t.mask, probs * log_all, 0.0), axis=-1).mean()
        total = pg_loss + cfg.vf_coef * v_loss - ent_coef * ent
        # Schulman's unbiased approx-KL estimate E[(r-1) - log r] (the SB3
        # target_kl statistic); stop_gradient — diagnostics/gating only.
        approx_kl = jax.lax.stop_gradient(
            ((ratio - 1.0) - (log_prob - t.log_prob)).mean())
        return total, (pg_loss, v_loss, ent, approx_kl)

    grad_fn = jax.value_and_grad(_loss, has_aux=True)

    def update_fn(ts: TrainState, axis_name: str | None = None):
        """One PPO update: rollout + GAE + epochs×minibatches of SGD.

        When ``axis_name`` is set (inside shard_map/pmap over a data-parallel
        mesh axis), gradients are pmean'd across the axis so parameters stay
        replicated while envs stay sharded.
        """
        key, k_roll, k_perm, k_reset = jax.random.split(ts.key, 4)
        if axis_name is not None:
            # The carried key is replicated across the mesh; decorrelate the
            # per-shard rollout/permutation draws while keeping params (and
            # the carried key) bit-identical on every shard.
            idx = jax.lax.axis_index(axis_name)
            k_roll = jax.random.fold_in(k_roll, idx)
            k_perm = jax.random.fold_in(k_perm, idx)
            k_reset = jax.random.fold_in(k_reset, idx)
        env_states, ret_carry0 = ts.env_states, ts.ret_carry
        if cfg.reset_envs_every:
            # Staggered per-lane time limit BEFORE the rollout (see
            # PPOConfig.reset_envs_every): lane i resets at update u when
            # (u + i) % K == 0, so 1/K of the lanes truncate each update
            # (no synchronized composition shock) and every lane's episode
            # age is capped at K*rollout_len steps. GAE is unaffected (the
            # reset sits between updates); ret_carry zeroes with the lane.
            n_local = ret_carry0.shape[0]
            lanes = jnp.arange(n_local)
            do_lane = ((ts.update_idx + lanes) % cfg.reset_envs_every) == 0
            fresh = jax.vmap(hooks.reset)(jax.random.split(k_reset, n_local))
            env_states = jax.tree.map(
                lambda a, b: jnp.where(
                    do_lane.reshape((-1,) + (1,) * (a.ndim - 1)), a, b),
                fresh, env_states)
            ret_carry0 = jnp.where(do_lane, 0.0, ret_carry0)
        env_states, traj, raw_rewards, rets, ret_carry = _rollout(
            ts.params, env_states, k_roll, ts.obs_stats, ts.ret_stats,
            ret_carry0)

        # VecNormalize-style stat refresh (pmean-merged across shards).
        # traj.obs may be stored bf16 (fused+bf16 path) — accumulate stats
        # in f32.
        obs_stats = (update_stats(
            ts.obs_stats,
            traj.obs.reshape(-1, hooks.obs_dim).astype(jnp.float32),
            axis_name)
            if cfg.normalize_obs else ts.obs_stats)
        ret_stats = (update_stats(ts.ret_stats, rets.reshape(-1), axis_name)
                     if cfg.normalize_reward else ts.ret_stats)

        last_obs = jax.vmap(hooks.observe)(env_states)
        if cfg.normalize_obs:
            last_obs = normalize(ts.obs_stats, last_obs)
        last_mask = jax.vmap(hooks.action_mask)(env_states)
        _, last_value = net.apply(ts.params, last_obs, last_mask)
        adv, ret = _gae(traj, last_value)

        E_local = traj.action.shape[1]
        B = cfg.rollout_len * E_local  # local batch (shard-aware)
        flat = (None if cfg.env_shuffle else jax.tree.map(
            lambda x: x.reshape((B,) + x.shape[2:]), (traj, adv, ret)))

        if cfg.ent_coef_final >= 0.0 and cfg.total_updates > 0:
            frac = jnp.clip(ts.update_idx.astype(jnp.float32)
                            / cfg.total_updates, 0.0, 1.0)
            ent_coef = cfg.ent_coef + (cfg.ent_coef_final - cfg.ent_coef) * frac
        else:
            ent_coef = jnp.float32(cfg.ent_coef)

        def mini(carry, batch):
            params, opt_state, stop = carry
            (loss, aux), grads = grad_fn(params, batch, ent_coef)
            approx_kl = aux[-1]
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
                # All shards must take the same stop decision — gate on the
                # pmean'd KL so params stay bit-identical across shards.
                approx_kl = jax.lax.pmean(approx_kl, axis_name)
            if cfg.kl_target > 0.0:
                # SB3 semantics: the minibatch whose KL exceeds the target is
                # NOT applied, nor is anything after it this update.
                stop = stop | (approx_kl > cfg.kl_target)

                def _apply(_):
                    upd, new_opt = tx.update(grads, opt_state, params)
                    return optax.apply_updates(params, upd), new_opt

                params, opt_state = jax.lax.cond(
                    stop, lambda _: (params, opt_state), _apply, None)
            else:
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
            skipped = stop.astype(jnp.float32) if cfg.kl_target > 0.0 \
                else jnp.float32(0.0)
            return (params, opt_state, stop), (loss, *aux, skipped)

        def epoch(carry, k):
            params, opt_state, stop = carry
            if cfg.env_shuffle:
                # Permute the env axis (contiguous [T]-column gather) and
                # slice minibatches along the PERMUTED env axis — minibatch
                # m = all T timesteps x the m-th random env subset, so the
                # partition varies with perm (the pre-r05 timestep-block
                # slicing was invariant to perm — the permutation was dead
                # compute and the partition identical every epoch/update).
                # Avoids the O(B) random-row gather (PPOConfig.env_shuffle).
                assert E_local % cfg.minibatches == 0, \
                    f"env_shuffle: local envs {E_local} % {cfg.minibatches}"
                perm = jax.random.permutation(k, E_local)
                shuf = jax.tree.map(lambda x: x[:, perm], (traj, adv, ret))
                mb = jax.tree.map(
                    lambda x: x.reshape(
                        (x.shape[0], cfg.minibatches, -1) + x.shape[2:])
                    .swapaxes(0, 1)
                    .reshape((cfg.minibatches, -1) + x.shape[2:]),
                    shuf)
            else:
                perm = jax.random.permutation(k, B)
                shuf = jax.tree.map(lambda x: x[perm], flat)
                mb = jax.tree.map(
                    lambda x: x.reshape((cfg.minibatches, -1) + x.shape[1:]),
                    shuf)
            carry, metrics = jax.lax.scan(mini, (params, opt_state, stop), mb)
            return carry, metrics

        (params, opt_state, _), metrics = jax.lax.scan(
            epoch, (ts.params, ts.opt_state, jnp.bool_(False)),
            jax.random.split(k_perm, cfg.epochs))

        loss, pg, vf, ent, approx_kl, kl_skipped = (m.mean() for m in metrics)
        mean_rew = raw_rewards.mean()
        episodes = traj.done.sum()
        if axis_name is not None:
            loss, pg, vf, ent, mean_rew, approx_kl, kl_skipped = (
                jax.lax.pmean(x, axis_name)
                for x in (loss, pg, vf, ent, mean_rew, approx_kl, kl_skipped))
            episodes = jax.lax.psum(episodes, axis_name)
        out = ts.replace(params=params, opt_state=opt_state,
                         env_states=env_states, key=key,
                         update_idx=ts.update_idx + 1,
                         obs_stats=obs_stats, ret_stats=ret_stats,
                         ret_carry=ret_carry)
        return out, {"loss": loss, "pg_loss": pg, "vf_loss": vf,
                     "entropy": ent, "mean_reward": mean_rew,
                     "episodes": episodes, "approx_kl": approx_kl,
                     "kl_skipped": kl_skipped}

    def policy_fn(params, obs, mask):
        return net.apply(params, obs, mask)

    return init_fn, update_fn, policy_fn


def sim_env_hooks() -> EnvHooks:
    """Hooks for the single-blind SimEnv (BASELINE config 1)."""
    from balatro_gym_tpu.engine import sim_env

    return EnvHooks(
        reset=sim_env.reset,
        step_autoreset=sim_env.step_autoreset,
        step=sim_env.step_action,
        observe=sim_env.observe,
        action_mask=sim_env.action_mask,
        n_actions=10,
        obs_dim=sim_env.OBS_DIM,
    )


def full_env_hooks() -> EnvHooks:
    """Hooks for the flagship Discrete(60) full-game env."""
    from balatro_gym_tpu.core.constants import Action
    from balatro_gym_tpu.engine import full_env

    return EnvHooks(
        reset=full_env.reset,
        step_autoreset=full_env.step_autoreset,
        step=full_env.step,
        observe=full_env.observe_vector,
        action_mask=full_env.action_mask,
        n_actions=Action.ACTION_SPACE_SIZE,
        obs_dim=full_env.OBS_VEC_DIM,
    )


def train(num_updates: int = 16, cfg: PPOConfig | None = None, seed: int = 0,
          hooks: EnvHooks | None = None, log_every: int = 0):
    """Single-chip training entry point. Returns (TrainState, last metrics)."""
    cfg = cfg or PPOConfig()
    hooks = hooks or sim_env_hooks()
    init_fn, update_fn, _ = make_ppo(hooks, cfg)
    ts = init_fn(jax.random.key(seed))
    step = jax.jit(functools.partial(update_fn, axis_name=None))
    metrics = None
    for i in range(num_updates):
        ts, metrics = step(ts)
        if log_every and (i + 1) % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"update {i + 1}: {m}")
    return ts, metrics
