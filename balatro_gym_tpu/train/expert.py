"""Expert policy — exhaustive on-device play search.

Rebuild of ``BalatroExpertAgent`` (reference: expert_agent.py:10-213). The
reference searches all C(hand,≤5) plays with a placeholder evaluator
(expert_agent.py:148-154: score = len(cards)*10) and decides play-vs-hold by
``score >= 1.2 * chips_needed / hands_left`` (:77-86); its shop policy values
jokers at ``50 - 5*ante`` (doubled for the first joker, :193-206).

TPU-first redesign: instead of a Python loop over combinations, ALL 218
subsets of the 8 visible hand positions (sizes 1-5) are scored in one
``vmap`` through the real unified scoring pipeline (levels + jokers
included), so the expert plays the argmax of the exact env score — strictly
stronger than the reference's placeholder while keeping its decision
thresholds. Fully jittable: drives vmapped fleets for trajectory generation
and imitation learning.

The policy is incremental like the reference (:54-75): it toggles one card
per step toward the target subset, then plays.
"""
from __future__ import annotations

from itertools import combinations

import jax
import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.core.constants import Action, Phase
from balatro_gym_tpu.engine import full_env as fe
from balatro_gym_tpu.engine import shop_logic as SL
from balatro_gym_tpu.ops.scoring import score_env_unified

_I64 = jax.dtypes.canonicalize_dtype(jnp.int64)  # i64 under x64, i32 in production (no dtype warnings)

# All subsets of positions 0-7 with 1..5 elements -> [218, 8] bool.
_masks = []
for _r in range(1, 6):
    for _combo in combinations(range(8), _r):
        _m = np.zeros(8, bool)
        _m[list(_combo)] = True
        _masks.append(_m)
SUBSET_MASKS = jnp.asarray(np.stack(_masks))  # [218, 8]
NUM_SUBSETS = SUBSET_MASKS.shape[0]


def _score_subset(st: fe.FullEnvState, mask):
    """Exact unified-pipeline score of playing `mask` (no RNG side effects:
    a fixed key makes Misprint/Bloodstone deterministic for ranking)."""
    ranks, suits, enh, ed, seal, present = fe._hand_card_view(st)
    sel = mask & present
    score, ht = score_env_unified(
        ranks, suits, sel, enh, ed, st.hand_levels, st.jokers,
        st.hands_left, st.discards_left, jnp.int32(52),
        jax.random.key(0),
    )
    return jnp.where(jnp.any(sel), score, jnp.asarray(-1, _I64)), ht


def best_play(st: fe.FullEnvState):
    """(best_mask [8], best_score) over all 218 subsets — one vmap."""
    scores, _ = jax.vmap(lambda m: _score_subset(st, m))(SUBSET_MASKS)
    best = jnp.argmax(scores)
    return SUBSET_MASKS[best], scores[best]


def expert_action(st: fe.FullEnvState):
    """Greedy expert action for any phase. Jittable; vmap over envs."""
    # ---- play phase ----
    target, score = best_play(st)
    sel = st.selected
    # Next card to toggle: first position where selection differs from target.
    diff = sel != target
    next_pos = jnp.argmax(diff)
    aligned = ~jnp.any(diff)
    play_action = jnp.where(
        aligned & jnp.any(sel),
        jnp.int32(Action.PLAY_HAND),
        jnp.int32(Action.SELECT_CARD_BASE) + next_pos.astype(jnp.int32))

    # ---- shop phase: value jokers at 50 - 5*ante (x2 for the first),
    # buy the best affordable positive-value item, else end shop. ----
    joker_value = (50.0 - 5.0 * st.ante.astype(jnp.float32)) * \
        jnp.where(st.joker_n == 0, 2.0, 1.0)
    slots = jnp.arange(SL.SHOP_SLOTS)
    affordable = (slots < st.shop_n) & (st.shop_cost <= st.money)
    is_joker = st.shop_type == SL.IT_JOKER
    value = jnp.where(is_joker, joker_value, 10.0)
    value = jnp.where(affordable, value, -jnp.inf)
    best_item = jnp.argmax(value)
    can_buy = (value[best_item] > 0) & \
        (~is_joker[best_item] | (st.joker_n < st.joker_slots))
    shop_action = jnp.where(
        can_buy,
        jnp.int32(Action.SHOP_BUY_BASE) + best_item.astype(jnp.int32),
        jnp.int32(Action.SHOP_END))

    # ---- blind select: always take the blind (small first per round). ----
    blind_action = jnp.int32(Action.SELECT_BLIND_BASE) + \
        jnp.clip(st.round - 1, 0, 2).astype(jnp.int32)

    action = jnp.where(
        st.phase == Phase.PLAY, play_action,
        jnp.where(st.phase == Phase.SHOP, shop_action,
                  jnp.where(st.phase == Phase.BLIND_SELECT, blind_action,
                            jnp.int32(Action.SKIP_PACK))))
    return action


def rollout_expert(key, n_envs: int, n_steps: int):
    """Expert-policy vmapped rollout with autoreset. Returns
    (final_states, total_reward, episodes, max_ante_seen)."""
    states = jax.vmap(fe.reset)(jax.random.split(key, n_envs))

    def body(carry, _):
        sts, tot, eps, best_ante = carry
        actions = jax.vmap(expert_action)(sts)
        sts2, rew, done = jax.vmap(fe.step_autoreset)(sts, actions)
        return (sts2, tot + jnp.sum(rew),
                eps + jnp.sum(done, dtype=jnp.int32),
                jnp.maximum(best_ante, jnp.max(sts2.ante))), None

    init = (states, jnp.zeros((), jnp.float32), jnp.int32(0), jnp.int32(1))
    (states, total, eps, best_ante), _ = jax.lax.scan(body, init, None, length=n_steps)
    return states, total, eps, best_ante
