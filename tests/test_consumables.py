"""Consumable subsystem: tarot/planet/spectral net effects through the
env-pipeline quirks (reward shaping, double-append, no-op syncs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balatro_gym_tpu.core.cards import Enhancement, Seal
from balatro_gym_tpu.core.constants import Action, HandType
from balatro_gym_tpu.engine import consumable_logic as CL
from balatro_gym_tpu.engine import full_env as fe


@pytest.fixture(scope="module")
def step():
    return jax.jit(fe.step)


def in_play(step, seed=0, cons=(), selected=()):
    st = fe.reset(jax.random.key(seed))
    st, _, _ = step(st, jnp.int32(45))
    carr = np.zeros(fe.MAX_CONS, np.int32)
    for i, c in enumerate(cons):
        carr[i] = c
    sel = np.zeros(fe.SEL, bool)
    for p in selected:
        sel[p] = True
    return st.replace(cons=jnp.asarray(carr), cons_n=jnp.int32(len(cons)),
                      selected=jnp.asarray(sel))


USE0 = Action.USE_CONSUMABLE_BASE


def test_planet_levels_and_reward(step):
    # Mercury (id 30) -> One Pair level +1, reward +10 (balatro_env_2.py:1101-1120).
    st = in_play(step, cons=[30])
    st2, r, _ = step(st, jnp.int32(USE0))
    assert float(r) == 10.0
    assert int(st2.hand_levels[HandType.ONE_PAIR]) == 2
    assert int(st2.cons_n) == 0


def test_hermit_doubles_money_capped(step):
    st = in_play(step, cons=[CL.HERMIT])
    st = st.replace(money=jnp.int32(15))
    st2, r, _ = step(st, jnp.int32(USE0))
    assert int(st2.money) == 30
    assert float(r) == pytest.approx(1.5)
    st = in_play(step, cons=[CL.HERMIT]).replace(money=jnp.int32(100))
    st2, r, _ = step(st, jnp.int32(USE0))
    assert int(st2.money) == 120  # capped at +20


def test_magician_enhances_two_selected(step):
    st = in_play(step, cons=[CL.MAGICIAN], selected=[1, 3, 4])
    st2, r, _ = step(st, jnp.int32(USE0))
    idx = np.asarray(st.hand_idx)
    enh = np.asarray(st2.card_enh)
    # First 2 selected positions get LUCKY; third untouched.
    assert enh[idx[1]] == Enhancement.LUCKY
    assert enh[idx[3]] == Enhancement.LUCKY
    assert enh[idx[4]] == Enhancement.NONE
    assert float(r) == 4.0
    assert int(st2.cons_n) == 0
    assert not np.asarray(st2.selected).any()


def test_targeted_tarot_fails_without_selection(step):
    st = in_play(step, cons=[CL.MAGICIAN])
    st2, r, _ = step(st, jnp.int32(USE0))
    assert float(r) == -1.0
    assert int(st2.cons_n) == 1  # not consumed


def test_seal_spectrals(step):
    # Deja Vu's 'Red Seal' lands cross-enum (#A42): SpectralEffects writes
    # consumables.py's Seal.RED = 1, which the play path reads as cards.py's
    # Seal.GOLD — live-verified by the differential harness (+$3 on play).
    st = in_play(step, cons=[CL.DEJA_VU], selected=[0])
    st2, r, _ = step(st, jnp.int32(USE0))
    idx = np.asarray(st.hand_idx)
    assert np.asarray(st2.card_seal)[idx[0]] == Seal.GOLD
    assert float(r) == 2.0
    # Talisman's 'Gold' (3) likewise lands as cards.py BLUE.
    st = in_play(step, cons=[CL.TALISMAN], selected=[0])
    st2, r, _ = step(st, jnp.int32(USE0))
    assert np.asarray(st2.card_seal)[np.asarray(st.hand_idx)[0]] == Seal.BLUE


def test_suit_conversion_is_noop_with_reward(step):
    # Star: rank/suit sync dropped (balatro_env_2.py:1122-1137) -> suits
    # unchanged, reward 2*min(3, n_sel).
    st = in_play(step, cons=[CL.STAR], selected=[0, 1, 2, 3])
    suits_before = np.asarray(st.card_suit).copy()
    st2, r, _ = step(st, jnp.int32(USE0))
    assert np.array_equal(np.asarray(st2.card_suit), suits_before)
    assert float(r) == 6.0
    assert int(st2.cons_n) == 0


def test_judgement_double_append(step):
    # Judgement alone (slots=2): in-effect append + env re-append -> two
    # copies of the same planet (balatro_env_2.py:1094,1156-1159).
    st = in_play(step, cons=[CL.JUDGEMENT])
    st2, r, _ = step(st, jnp.int32(USE0))
    cons = np.asarray(st2.cons)
    assert int(st2.cons_n) == 2
    assert cons[0] == cons[1]
    assert 30 <= cons[0] < 39  # planets Mercury..Pluto only
    assert float(r) == 5.0


def test_judgement_with_full_slots_creates_nothing(step):
    st = in_play(step, cons=[CL.JUDGEMENT, CL.HERMIT])
    st2, r, _ = step(st, jnp.int32(USE0))
    # L=2 == slots -> no in-effect append; items_created empty.
    assert int(st2.cons_n) == 1
    assert int(st2.cons[0]) == CL.HERMIT
    assert float(r) == 0.0


def test_soul_creates_legendary(step):
    st = in_play(step, cons=[CL.THE_SOUL])
    st2, r, _ = step(st, jnp.int32(USE0))
    assert int(st2.joker_n) == 1
    assert 146 <= int(st2.jokers[0]) <= 150
    assert float(r) == 15.0


def test_wraith_hand_size_penalty(step):
    st = in_play(step, cons=[CL.WRAITH])
    st2, r, _ = step(st, jnp.int32(USE0))
    assert int(st2.hand_size) == 7
    assert float(r) == 15.0


def test_immolate_destroys_five(step):
    st = in_play(step, cons=[CL.IMMOLATE])
    m0 = int(st.money)
    st2, r, _ = step(st, jnp.int32(USE0))
    assert int(np.sum(np.asarray(st2.card_alive))) == 47
    assert int(st2.money) == m0 + 20
    assert float(r) == 7.0  # 5 destroyed + 20/10


def test_black_hole_noop(step):
    st = in_play(step, cons=[CL.BLACK_HOLE])
    levels = np.asarray(st.hand_levels).copy()
    st2, r, _ = step(st, jnp.int32(USE0))
    assert float(r) == 0.0
    assert int(st2.cons_n) == 0  # consumed (success)
    assert np.array_equal(np.asarray(st2.hand_levels), levels)


def test_hanged_man_destroys_selected(step):
    st = in_play(step, cons=[CL.HANGED_MAN], selected=[0, 1, 2])
    st2, r, _ = step(st, jnp.int32(USE0))
    assert int(np.sum(np.asarray(st2.card_alive))) == 50  # only 2 destroyed
    assert int(st2.hand_n) == 6
    assert float(r) == 4.0


def test_cryptid_copies_card(step):
    st = in_play(step, cons=[CL.CRYPTID], selected=[2])
    idx = np.asarray(st.hand_idx)
    r0 = int(np.asarray(st.card_rank)[idx[2]])
    st2, r, _ = step(st, jnp.int32(USE0))
    assert int(np.sum(np.asarray(st2.card_alive))) == 54
    new = np.asarray(st2.card_alive)[52:] & (np.asarray(st2.card_rank)[52:] == r0)
    assert new.sum() == 2
    assert float(r) == 6.0


def test_sigil_converts_hand_suit(step):
    st = in_play(step, cons=[CL.SIGIL])
    st2, r, _ = step(st, jnp.int32(USE0))
    idx = np.asarray(st2.hand_idx)[:8]
    suits = np.asarray(st2.card_suit)[idx]
    assert len(set(suits.tolist())) == 1
    assert float(r) == 16.0


def test_ouija_converts_rank_and_hand_size(step):
    st = in_play(step, cons=[CL.OUIJA])
    st2, r, _ = step(st, jnp.int32(USE0))
    idx = np.asarray(st2.hand_idx)[:8]
    ranks = np.asarray(st2.card_rank)[idx]
    assert len(set(ranks.tolist())) == 1
    assert int(st2.hand_size) == 7


def test_fool_copies_consumable(step):
    st = in_play(step, cons=[CL.FOOL, CL.HERMIT])
    st2, r, _ = step(st, jnp.int32(USE0))
    # Fool picks one of [Fool, Hermit]; after pop: [Hermit, copy]; env
    # re-append is gated by len < slots(2) -> no third copy.
    assert int(st2.cons_n) == 2
    assert int(st2.cons[0]) == CL.HERMIT
    assert int(st2.cons[1]) in (CL.FOOL, CL.HERMIT)


def test_fool_alone_self_duplicates(step):
    # The self-duplicating-Fool quirk (balatro_env_2.py:1156-1159): in-list
    # copy, pop, then env re-append of items_created -> TWO Fools remain.
    st = in_play(step, cons=[CL.FOOL])
    st2, r, _ = step(st, jnp.int32(USE0))
    assert int(st2.cons_n) == 2
    assert int(st2.cons[0]) == CL.FOOL and int(st2.cons[1]) == CL.FOOL


def test_emperor_creates_enumname_tarots(step):
    st = in_play(step, cons=[CL.EMPEROR])
    st2, r, _ = step(st, jnp.int32(USE0))
    # slots=2, L=1: one in-effect append + one env re-append.
    assert int(st2.cons_n) == 2
    assert all(int(c) >= CL.ENUMNAME_OFFSET for c in np.asarray(st2.cons)[:2])
    # Enum-name tarots observe as id 0 (balatro_env_2.py:1543-1573).
    obs = fe.observe(st2)
    assert np.asarray(obs["consumables"])[0] == 0


def test_mask_exposes_consumables(step):
    st = in_play(step, cons=[30, CL.HERMIT])
    mask = np.asarray(fe.action_mask(st))
    assert mask[USE0] and mask[USE0 + 1] and not mask[USE0 + 2]
