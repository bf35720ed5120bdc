"""Macro-action env — ``BalatroEnvComplete`` rebuilt TPU-native.

Reference: balatro_gym/balatro_env_v2.py:60-400. ``Discrete(70)``:

* 0-5  play strategies (best-detected / first-5 / pair / two-pair / trips /
  flush; fallbacks to the first k cards, :213-232),
* 6-8  discard first 1 / first 3 / all (:258-276),
* 10-69 shop actions in the reference ``ShopAction`` id scheme (SKIP=10,
  REROLL=11, BUY_PACK 12+, BUY_JOKER 20+, BUY_CARD 40+, BUY_VOUCHER 60+,
  shop.py:44-68) indexed by inventory position. BUG-FAITHFUL id soup: the
  reference mask emits ``BUY_PACK_BASE+i`` for EVERY affordable slot
  (v2:314-316), so non-pack items are bought through the pack verb — the
  shop charges, pops, appends one random card to the purchased deck, and the
  env layer then adds the joker if the item was one (v2:170-183, unbounded
  past 5 slots up to our physical cap of 16, #A43/#B15); slot 8's id collides with
  ``BUY_JOKER_BASE`` and decodes as a joker-verb buy of slot... the verb's
  own index. Vouchers bought via the pack verb never reach the voucher list.

Scoring runs the sim pipeline (ops.scoring.score_sim — the fixture path);
reward = score/100, discard −0.1, invalid discard −1 (:243,269,276). A round
is 4 hands; exhausting them advances the ante, pays ``min(ante+2,10)+ante``
(:295-300 with the post-increment ante) and opens a shop. Episode terminates
past ante 8 (the obs bound, :80).

Dealing: the LIVE reference never deals a card — ``BalatroGame.deck`` starts
empty and nothing populates it, so the hand is shape (0,) and every play
action crashes on the missing ``ScoreEngine.score`` (PARITY #B15 has the
full live status). We deal 8 fresh cards sequentially from a shuffled 52
(reshuffling when fewer than 8 remain) — the evidently intended semantics,
live-delimited by ``tests/test_reference_differential_macro.py`` whose
forced-deal seam pins the hand during comparison.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from balatro_gym_tpu.core import cards as C
from balatro_gym_tpu.engine import shop_logic as SL
from balatro_gym_tpu.ops.hand_eval import macro_select
from balatro_gym_tpu.ops.scoring import score_sim

_I64 = jax.dtypes.canonicalize_dtype(jnp.int64)  # i64 under x64, i32 in production (no dtype warnings)
# f64 under x64 (bit-exact reward parity vs the reference's python floats —
# scores reach 1e5 where f32 visibly rounds score/100), f32 in production.
_F64 = jax.dtypes.canonicalize_dtype(jnp.float64)

HAND = 8
JOKER_CAP = 16
ACTION_SPACE_SIZE = 70
PHASE_PLAY, PHASE_SHOP = 0, 1

# ShopAction ids (shop.py:44-68)
A_SKIP, A_REROLL = 10, 11
A_PACK, A_JOKER, A_CARD, A_VOUCHER = 12, 20, 40, 60


@struct.dataclass
class MacroEnvState:
    deck_rank: jnp.ndarray   # [52] i32
    deck_suit: jnp.ndarray   # [52] i32
    deck_ptr: jnp.ndarray    # i32 next card to deal
    hand_rank: jnp.ndarray   # [8] i32
    hand_suit: jnp.ndarray   # [8] i32
    chips: jnp.ndarray       # i32 money ("player.chips")
    score_total: jnp.ndarray  # i64
    ante: jnp.ndarray        # i32
    hands_left: jnp.ndarray  # i32
    discards_left: jnp.ndarray  # i32
    jokers: jnp.ndarray      # [JOKER_CAP] i32 (reference appends unbounded
    # via the id-soup + #A43 — 16 physical slots comfortably cover scripted
    # and trained play; scoring reads ALL of them like the reference)
    joker_n: jnp.ndarray     # i32
    purchased_cards: jnp.ndarray  # i32 — player_state.deck length (shop buys)
    vouchers: jnp.ndarray    # u32
    phase: jnp.ndarray       # i32
    shop_type: jnp.ndarray   # [10] i32
    shop_item: jnp.ndarray   # [10] i32
    shop_cost: jnp.ndarray   # [10] i32
    shop_n: jnp.ndarray      # i32
    reroll_base: jnp.ndarray  # i32
    key: jnp.ndarray
    done: jnp.ndarray


def _shuffled_deck(key):
    ranks, suits = C.standard_deck_arrays()
    perm = jax.random.permutation(key, 52)
    return (jnp.asarray(ranks, jnp.int32)[perm],
            jnp.asarray(suits, jnp.int32)[perm])


def _deal(st: MacroEnvState) -> MacroEnvState:
    """Deal a fresh 8-card hand; reshuffle when the deck runs dry."""
    key, k_shuf = jax.random.split(st.key)
    need_shuffle = st.deck_ptr + HAND > 52
    new_rank, new_suit = _shuffled_deck(k_shuf)
    deck_rank = jnp.where(need_shuffle, new_rank, st.deck_rank)
    deck_suit = jnp.where(need_shuffle, new_suit, st.deck_suit)
    ptr = jnp.where(need_shuffle, 0, st.deck_ptr)
    sl = jax.lax.dynamic_slice_in_dim
    return st.replace(
        deck_rank=deck_rank, deck_suit=deck_suit,
        hand_rank=sl(deck_rank, ptr, HAND),
        hand_suit=sl(deck_suit, ptr, HAND),
        deck_ptr=ptr + HAND, key=key,
    )


def reset(key) -> MacroEnvState:
    k_deck, key = jax.random.split(key)
    dr, ds = _shuffled_deck(k_deck)
    st = MacroEnvState(
        deck_rank=dr, deck_suit=ds, deck_ptr=jnp.int32(0),
        hand_rank=jnp.zeros(HAND, jnp.int32), hand_suit=jnp.zeros(HAND, jnp.int32),
        chips=jnp.int32(100), score_total=jnp.asarray(0, _I64),
        ante=jnp.int32(1), hands_left=jnp.int32(4), discards_left=jnp.int32(3),
        jokers=jnp.zeros(JOKER_CAP, jnp.int32), joker_n=jnp.int32(0),
        purchased_cards=jnp.int32(0),
        vouchers=jnp.uint32(0), phase=jnp.int32(PHASE_PLAY),
        shop_type=jnp.zeros(SL.SHOP_SLOTS, jnp.int32),
        shop_item=jnp.zeros(SL.SHOP_SLOTS, jnp.int32),
        shop_cost=jnp.zeros(SL.SHOP_SLOTS, jnp.int32),
        shop_n=jnp.int32(0), reroll_base=jnp.int32(SL.REROLL_BASE),
        key=key, done=jnp.zeros((), bool),
    )
    return _deal(st)


def _end_round(st: MacroEnvState) -> MacroEnvState:
    """Round over: ante++, blind money (post-increment ante), open shop."""
    ante = st.ante + 1
    blind_reward = jnp.minimum(ante + 2, 10) + ante
    key, k_shop = jax.random.split(st.key)
    types, items, costs, n = SL.generate_inventory(k_shop, ante, st.jokers[:5],
                                                    st.vouchers)
    return st.replace(
        ante=ante, chips=st.chips + blind_reward,
        phase=jnp.int32(PHASE_SHOP),
        shop_type=types, shop_item=items, shop_cost=costs, shop_n=n,
        reroll_base=jnp.int32(SL.REROLL_BASE), key=key,
        done=ante > 8,
    )


def _step_play(st: MacroEnvState, action):
    valid = jnp.ones(HAND, bool)
    # --- play macros 0-5 ---
    sel = macro_select(st.hand_rank, st.hand_suit, valid, jnp.clip(action, 0, 5))
    key, k_score = jax.random.split(st.key)
    base_value = ((st.hand_rank[:, None] == jnp.arange(15)).astype(jnp.float32)
                  @ C.RANK_CHIPS.astype(jnp.float32)).astype(jnp.int32)
    score, money_d, _ht, _mask = score_sim(
        st.hand_rank, st.hand_suit, sel,
        jnp.zeros(HAND, jnp.int32), jnp.zeros(HAND, jnp.int32),
        jnp.zeros(HAND, jnp.int32), base_value,
        st.jokers, st.hands_left, st.discards_left,
        st.purchased_cards, k_score)  # sim 'deck' = purchased cards
    # BUG-FAITHFUL: the reference adds the score to chips and then
    # immediately overwrites chips with the scoring-state money
    # (balatro_env_v2.py:236-238) — so only in-scoring money effects land.
    played = st.replace(
        chips=st.chips + money_d,
        score_total=st.score_total + score,
        hands_left=st.hands_left - 1, key=key)
    round_over = played.hands_left <= 0
    played = jax.tree.map(
        lambda a, b: jnp.where(round_over, a, b), _end_round(played), _deal(played))
    r_play = score.astype(_F64) / 100.0

    # --- discards 6-8 ---
    # Joker discard money (balatro_env_v2.py:262-264 -> balatro_sim.py:715-736):
    # the sim context has no 'is_first_discard', so Trading Card never fires
    # there — only Faceless Joker (>=3 face discards -> +$5).
    can_discard = st.discards_left > 0
    k = jnp.clip(jnp.where(action == 6, 1, jnp.where(action == 7, 3, 8)), 0, 8)
    disc_mask = jnp.arange(HAND) < k
    n_face = jnp.sum(disc_mask & (st.hand_rank >= 11) & (st.hand_rank <= 13))
    from balatro_gym_tpu.ops.joker_tables import J_FACELESS

    disc_money = jnp.where(jnp.any(st.jokers == J_FACELESS) & (n_face >= 3), 5, 0)
    discarded = _deal(st.replace(discards_left=st.discards_left - 1,
                                 chips=st.chips + disc_money))
    r_disc = jnp.where(can_discard, -0.1, -1.0)
    discarded = jax.tree.map(
        lambda a, b: jnp.where(can_discard, a, b), discarded, st)

    is_play = action <= 5
    is_disc = (action >= 6) & (action <= 8)
    # BUG-FAITHFUL: _step_play has no else-branch — any action >= 9 in the
    # play phase is a silent no-op with reward 0.0 (v2:205-274 falls
    # through to the return).
    st2 = jax.tree.map(lambda a, b, c: jnp.where(is_play, a,
                                                 jnp.where(is_disc, b, c)),
                       played, discarded, st)
    reward = jnp.where(is_play, r_play, jnp.where(is_disc, r_disc, 0.0))
    return st2, reward


def _step_shop(st: MacroEnvState, action):
    # skip
    ended = st.replace(phase=jnp.int32(PHASE_PLAY),
                       hands_left=jnp.int32(4), discards_left=jnp.int32(3))
    ended = _deal(ended)

    # reroll
    cost, next_base = SL.reroll_charge(st.reroll_base, st.ante, st.vouchers)
    afford = st.chips >= cost
    key, k_shop = jax.random.split(st.key)
    t2, i2, c2, n2 = SL.generate_inventory(k_shop, st.ante, st.jokers[:5],
                                           st.vouchers)
    rerolled = st.replace(chips=st.chips - cost, reroll_base=next_base,
                          shop_type=t2, shop_item=i2, shop_cost=c2, shop_n=n2,
                          key=key)
    rerolled = jax.tree.map(lambda a, b: jnp.where(afford, a, b), rerolled, st)
    r_reroll = jnp.where(afford, 0.0, -1.0)

    # --- buys: verb + index from the id soup (shop.py:56-68) ---
    is_pack_verb = (action >= A_PACK) & (action < A_JOKER)
    is_joker_verb = (action >= A_JOKER) & (action < A_CARD)
    is_card_verb = (action >= A_CARD) & (action < A_VOUCHER)
    idx = jnp.where(is_pack_verb, action - A_PACK,
                    jnp.where(is_joker_verb, action - A_JOKER,
                              jnp.where(is_card_verb, action - A_CARD,
                                        action - A_VOUCHER)))
    idx = jnp.clip(idx, 0, SL.SHOP_SLOTS - 1)
    itype = st.shop_type[idx]
    item = st.shop_item[idx]
    cost_i = st.shop_cost[idx]
    ok = (idx < st.shop_n) & (st.chips >= cost_i)
    t3, i3, c3, n3 = SL.pop_item(st.shop_type, st.shop_item, st.shop_cost,
                                 st.shop_n, idx)

    # Cards entering player_state.deck: pack-verb opens _open_pack on ANY
    # item (3 cards for a Standard Pack, else 1, shop.py:150-157); card-verb
    # appends the single card (shop.py:194-195).
    std_pack = (itype == SL.IT_PACK) & (item == SL.PACK_STANDARD)
    new_cards = jnp.where(is_pack_verb, jnp.where(std_pack, 3, 1),
                          jnp.where(is_card_verb, 1, 0))

    # Joker acquisition, exact reference layering (live-differentially
    # verified, tests/test_reference_differential_macro.py):
    # * joker-verb with <5 jokers: Shop.step appends WITHOUT dedup
    #   (shop.py:196-199) and the env layer's `not in jokers` check then
    #   sees the fresh append and skips (v2:182) — net one append, dups
    #   allowed;
    # * joker-verb with >=5 jokers: shop refuses (-1, after charging and
    #   popping) but the env layer appends iff not already owned;
    # * any other verb (pack/card/voucher) on a JOKER item: env-layer
    #   append only, dedup'd.
    dup = jnp.any(jnp.where(jnp.arange(JOKER_CAP) < st.joker_n,
                            st.jokers == item, False))
    add_joker = (itype == SL.IT_JOKER) & \
        ((is_joker_verb & (st.joker_n < 5)) | ~dup)
    jpos = jnp.clip(st.joker_n, 0, JOKER_CAP - 1)
    can_add = add_joker & (st.joker_n < JOKER_CAP)
    # Voucher reaches the voucher list only through the voucher verb
    # (pack-verb buys of a voucher just open it as a 'pack').
    add_voucher = (action >= A_VOUCHER) & (itype == SL.IT_VOUCHER)

    bought = st.replace(
        chips=st.chips - cost_i,
        shop_type=t3, shop_item=i3, shop_cost=c3, shop_n=n3,
        purchased_cards=st.purchased_cards + new_cards,
        jokers=jnp.where(can_add, st.jokers.at[jpos].set(item), st.jokers),
        joker_n=st.joker_n + jnp.where(can_add, 1, 0),
        vouchers=jnp.where(add_voucher,
                           st.vouchers | (jnp.uint32(1) << item.astype(jnp.uint32)),
                           st.vouchers))
    # BUG-FAITHFUL (#A43): the env's purchase layer captures the item BEFORE
    # shop.step and runs UNCONDITIONALLY after it (v2:170-183 never checks
    # success) — an unaffordable buy of a JOKER slot is not charged or
    # popped (shop.py:183-184 returns -1 first) but the joker IS appended
    # (dedup'd by the layer's `not in jokers`).
    bug_add = ((idx < st.shop_n) & ~(st.chips >= cost_i)
               & (itype == SL.IT_JOKER) & ~dup & (st.joker_n < JOKER_CAP))
    failed = st.replace(
        jokers=jnp.where(bug_add, st.jokers.at[jpos].set(item), st.jokers),
        joker_n=st.joker_n + jnp.where(bug_add, 1, 0))
    bought = jax.tree.map(lambda a, b: jnp.where(ok, a, b), bought, failed)
    # shop.step returns -1 for a joker-verb buy with 5+ jokers held (after
    # charging, shop.py:196-198); otherwise 0.
    r_buy = jnp.where(~ok, -1.0,
                      jnp.where(is_joker_verb & (st.joker_n >= 5), -1.0, 0.0))

    is_skip = action == A_SKIP
    is_reroll = action == A_REROLL
    is_buy = action >= A_PACK

    def pick(a, b, c, d):
        return jnp.where(is_skip, a, jnp.where(is_reroll, b, jnp.where(is_buy, c, d)))

    st2 = jax.tree.map(pick, ended, rerolled, bought, st)
    reward = pick(0.0, r_reroll, r_buy, -1.0)
    return st2, reward


def step(st: MacroEnvState, action):
    action = jnp.asarray(action, jnp.int32)
    p_st, p_r = _step_play(st, action)
    s_st, s_r = _step_shop(st, action)
    in_play = st.phase == PHASE_PLAY
    # Play phase accepts ANY action (>=9 are no-ops inside _step_play);
    # shop-phase actions < 10 CRASH the reference (ShopAction.decode raises,
    # shop.py:57-68) — not representable in a jitted step, kept as -1 freeze.
    valid = jnp.where(in_play, True, action >= A_SKIP)
    nxt = jax.tree.map(lambda a, b: jnp.where(in_play, a, b), p_st, s_st)
    reward = jnp.where(in_play, p_r, s_r)
    nxt = jax.tree.map(lambda a, b: jnp.where(valid & ~st.done, a, b), nxt, st)
    reward = jnp.where(st.done, 0.0, jnp.where(valid, reward, -1.0))
    return nxt, reward.astype(_F64), nxt.done


def action_mask(st: MacroEnvState):
    """v2._mask (v2:304-316): SKIP + REROLL unconditionally; BUY_PACK_BASE+i
    for every affordable inventory slot regardless of item type (slot 8's id
    20 collides with BUY_JOKER_BASE — bug-faithful)."""
    ids = jnp.arange(ACTION_SPACE_SIZE)
    play = (ids <= 5) | ((ids >= 6) & (ids <= 8) & (st.discards_left > 0))
    slots = jnp.arange(SL.SHOP_SLOTS)
    afford = (slots < st.shop_n) & (st.shop_cost <= st.chips)
    shop = jnp.zeros(ACTION_SPACE_SIZE, bool)
    shop = shop.at[A_SKIP].set(True)
    shop = shop.at[A_REROLL].set(True)
    # One-hot OR, NOT `.at[aid].max(bool)`: XLA:TPU's bool scatter-max
    # silently drops updates inside vmapped programs (see
    # consumable_logic Immolate comment for the repro).
    aid = jnp.clip(A_PACK + slots, 0, ACTION_SPACE_SIZE - 1)
    ids = jnp.arange(ACTION_SPACE_SIZE)
    shop = shop | jnp.any((ids[:, None] == aid[None, :]) & afford[None, :], axis=1)
    return jnp.where(st.phase == PHASE_PLAY, play, shop) & ~st.done


def observe(st: MacroEnvState):
    """Reference obs dict (balatro_env_v2.py:79-93): sim card codes + hand
    possibility flags."""
    from balatro_gym_tpu.ops.hand_eval import rank_counts

    valid = jnp.ones(HAND, bool)
    rc = rank_counts(st.hand_rank, valid)
    in_play = st.phase == PHASE_PLAY
    return {
        "hand": C.encode_sim(st.hand_rank, st.hand_suit).astype(jnp.int32),
        "chips": st.chips,
        "phase": st.phase,
        "action_mask": action_mask(st).astype(jnp.int32),
        "ante": st.ante,
        "hands_left": st.hands_left,
        "discards_left": st.discards_left,
        "joker_slots": jnp.where(jnp.arange(5) < st.joker_n, st.jokers[:5], -1),
        # Flags per evaluate_hand over the 8-card hand: the cascade makes
        # pair/trips fire for any >= count; Two Pair needs the exact-count
        # condition; flush/straight detection bails on len(hand)>5 so those
        # flags are ALWAYS 0 in the reference (balatro_sim.py:128-161).
        # The reference computes them ONLY in the play phase — shop-phase
        # obs show all-zero flags (balatro_env_v2.py:336-350).
        "has_pair": (in_play & jnp.any(rc >= 2)).astype(jnp.int32),
        "has_two_pair": (in_play
                         & ((jnp.sum(rc == 2) == 2)
                            | ((jnp.sum(rc == 3) == 1)
                               & (jnp.sum(rc == 2) == 1)))).astype(jnp.int32),
        "has_three_kind": (in_play & jnp.any(rc >= 3)).astype(jnp.int32),
        "has_straight": jnp.zeros((), jnp.int32),
        "has_flush": jnp.zeros((), jnp.int32),
    }


class BalatroMacroGymEnv:
    """Gym shell for the macro env (BalatroEnvComplete contract)."""

    metadata = {"render_modes": ["human"]}

    def __init__(self, *, seed: int = 0, render_mode: str | None = None):
        self.render_mode = render_mode
        self._seed = seed
        self._st = None
        self._jstep = jax.jit(step)
        self._jreset = jax.jit(reset)
        self._jobs = jax.jit(observe)
        try:
            from gymnasium import spaces

            self.action_space = spaces.Discrete(ACTION_SPACE_SIZE)
        except ImportError:  # pragma: no cover
            self.action_space = None

    def reset(self, *, seed: int | None = None, options=None):
        if seed is not None:
            self._seed = seed
        self._st = self._jreset(jax.random.key(self._seed))
        return self._obs(), {}

    def step(self, action: int):
        self._st, r, done = self._jstep(self._st, jnp.int32(int(action)))
        return self._obs(), float(r), bool(done), False, {}

    def _obs(self):
        return {k: np.asarray(v) for k, v in
                jax.device_get(self._jobs(self._st)).items()}

    def render(self):
        if self.render_mode != "human":
            return
        st = self._st
        hand = " ".join(C.card_str(int(r), int(s))
                        for r, s in zip(np.asarray(st.hand_rank), np.asarray(st.hand_suit)))
        print(f"[ante {int(st.ante)} phase {int(st.phase)}] ${int(st.chips)} "
              f"hands {int(st.hands_left)} | {hand}")

    def close(self):
        pass
