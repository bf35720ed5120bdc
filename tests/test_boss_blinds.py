"""Boss blind behaviors through the flagship env (ops/boss.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balatro_gym_tpu.core.constants import Action, HandType
from balatro_gym_tpu.engine import full_env as fe
from balatro_gym_tpu.ops import boss as B


@pytest.fixture(scope="module")
def step():
    return jax.jit(fe.step)


def with_boss(step, boss_id, seed=0):
    st, _, _ = step(fe.reset(jax.random.key(seed)), jnp.int32(45))
    return st.replace(boss_active=jnp.ones((), bool), boss_id=jnp.int32(boss_id),
                      chips_needed=jnp.int64(10 ** 9))


def plant(st, cards):
    ranks = np.array(st.card_rank)
    suits = np.array(st.card_suit)
    idx = np.asarray(st.hand_idx)
    for i, (r, s) in enumerate(cards):
        ranks[idx[i]], suits[idx[i]] = r, s
    return st.replace(card_rank=jnp.asarray(ranks), card_suit=jnp.asarray(suits))


def play(step, st, positions):
    for p in positions:
        st, _, _ = step(st, jnp.int32(Action.SELECT_CARD_BASE + p))
    return step(st, jnp.int32(Action.PLAY_HAND))


def test_flint_halves_base_ratio(step):
    # Lone ace high card, level 1: base (5,1); Flint: (2,0)->mult 0 ratio 0.
    st = plant(with_boss(step, B.FLINT), [(14, 3)])
    st, r, _ = play(step, st, [0])
    # chips 5//2=2, mult 1//2=0 -> ratio 0 -> score 0.
    assert int(st.round_chips_scored) == 0


def test_arm_reduces_by_ratio(step):
    # Pair of 9s: base (10,2); Arm: int(10*.75)=7, int(2*.75)=1.
    # base score (10+18)*2=56 -> *7/10*1/2 = int(56*0.35)=19.
    st = plant(with_boss(step, B.ARM), [(9, 0), (9, 1)])
    st, r, _ = play(step, st, [0, 1])
    assert int(st.round_chips_scored) == 19


def test_plant_debuffs_face_cards(step):
    # Lone king: (5+10)*1 = 15; Plant: 1 debuffed face -> 0.8 penalty on
    # chips AND mult: int(5*.8)=4, int(1*.8)=0 -> ratio 0 -> 0.
    st = plant(with_boss(step, B.PLANT), [(13, 2)])
    st, _, _ = play(step, st, [0])
    assert int(st.round_chips_scored) == 0


def test_violet_debuffs_all(step):
    st = plant(with_boss(step, B.VIOLET), [(14, 3)])
    st, _, _ = play(step, st, [0])
    assert int(st.round_chips_scored) == 0


def test_goad_suit_debuff_never_fires(step):
    # Bug-faithful: Suit-enum-vs-string comparison is dead (PARITY #12).
    st = plant(with_boss(step, B.GOAD), [(14, 3)])  # spade
    st, _, _ = play(step, st, [0])
    assert int(st.round_chips_scored) == 16


def test_mouth_locks_hand_type(step):
    st = plant(with_boss(step, B.MOUTH),
               [(9, 0), (9, 1), (14, 2), (13, 3)])
    st, r1, _ = play(step, st, [0, 1])   # pair
    assert float(r1) != -1.0
    # Playing [2] next classifies the accumulated highlight UNION over deck
    # slots {0,1,2} = 9,9,A — still a PAIR (#A39/#A40, live-verified), so
    # The Mouth ALLOWS it.
    st, r2, _ = play(step, st, [2])
    assert float(r2) != -1.0
    st, r3, _ = play(step, st, [0, 1])   # pair again: allowed
    assert float(r3) != -1.0

    # A genuine block needs the locked type to differ from the union type:
    # lock HIGH_CARD first, then a pair-classifying union is refused.
    st2 = plant(with_boss(step, B.MOUTH),
                [(9, 0), (9, 1), (14, 2), (13, 3)])
    st2, r4, _ = play(step, st2, [2])     # high card locks the round
    assert float(r4) != -1.0
    st2, r5, _ = play(step, st2, [0, 1])  # union {0,1,2} = pair: blocked
    assert float(r5) == -1.0


def test_verdant_escalates_requirement(step):
    st = with_boss(step, B.VERDANT)
    st, r, _ = play(step, st, [0, 1, 2])  # 3 < 5 required
    assert float(r) == -1.0
    # Blocked plays keep the selection (reference: no state change on error);
    # clear it before the next attempt.
    st = st.replace(selected=jnp.zeros(fe.SEL, bool))
    st, r, _ = play(step, st, [0, 1, 2, 3, 4])
    assert float(r) != -1.0
    assert int(st.boss_verdant_req) == 6
    st, r, _ = play(step, st, [0, 1, 2, 3, 4])  # 5 < 6 now
    assert float(r) == -1.0


def test_pillar_penalizes_replayed_cards(step):
    st = plant(with_boss(step, B.PILLAR), [(14, 3)])
    st, _, _ = play(step, st, [0])
    first = int(st.round_chips_scored)
    assert first == 16
    # Same card again (hand unchanged — quirk #1): debuffed 0.8 ->
    # chips int(5*.8)=4, mult int(1*.8)=0 -> 0.
    st, _, _ = play(step, st, [0])
    assert int(st.round_chips_scored) == first


def test_house_first_hand_face_down(step):
    # The House flips the whole redrawn hand only after a play (quirk #30:
    # effects run on the post-play redraw while first_hand is already False
    # -> House shows nothing, Fish flips all).
    st = with_boss(step, B.FISH)
    st, _, _ = play(step, st, [0])
    assert np.asarray(st.face_down).all()
    st2 = with_boss(step, B.HOUSE)
    st2, _, _ = play(step, st2, [0])
    assert not np.asarray(st2.face_down).any()


def test_hook_discards_two(step):
    st = with_boss(step, B.HOOK)
    st, _, _ = play(step, st, [0])
    assert int(st.hand_n) == 6  # 2 forcibly discarded, no refill


def test_mark_flips_faces(step):
    st = with_boss(step, B.MARK)
    st = plant(st, [(13, 0), (12, 1), (5, 2), (7, 3)])
    st, _, _ = play(step, st, [2])
    fd = np.asarray(st.face_down)
    assert fd[0] and fd[1] and not fd[2] and not fd[3]


def test_needle_water_manacle_activation(step):
    for boss, check in [
        (B.NEEDLE, lambda s: int(s.hands_left) == 1),
        (B.WATER, lambda s: int(s.discards_left) == 0),
        (B.MANACLE, lambda s: int(s.hand_size) == 7),
    ]:
        st = fe.reset(jax.random.key(1))
        # Force deterministic boss: monkeypatch via direct state surgery on
        # the post-selection state is insufficient for activation mods, so
        # verify via activation_mods + manual application instead.
        d, h, n = B.activation_mods(jnp.int32(boss))
        st2 = st.replace(
            discards_left=jnp.where(d >= 0, d, st.discards_left),
            hand_size=st.hand_size + h,
            hands_left=jnp.where(n >= 0, n, st.hands_left))
        assert check(st2)


def test_boss_cleared_on_advance(step):
    st = plant(with_boss(step, B.VIOLET), [(14, 3)])
    st = st.replace(chips_needed=jnp.int64(1), round_chips_scored=jnp.int64(5))
    st, _, _ = play(step, st, [0])
    assert not bool(st.boss_active)
    assert int(st.phase) == 1  # SHOP
    # Boss money reward (+5) included in the round payout.
