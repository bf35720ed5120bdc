"""Pack-opening opt-in module vs the reference handler's documented
semantics (envs/phase_handlers/pack_open.py:31-252; dead code in the
reference — see PARITY.md #B12 and engine/pack_logic.py's docstring)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balatro_gym_tpu.core.constants import Action, Phase
from balatro_gym_tpu.engine import consumable_logic as CL
from balatro_gym_tpu.engine import full_env
from balatro_gym_tpu.engine import pack_logic as PK

SEL0 = Action.SELECT_FROM_PACK_BASE


@pytest.fixture(scope="module")
def st0():
    return full_env.reset(jax.random.key(7))


def _open(st, kinds, ids, mega=False, **kw):
    return PK.open_pack(st, jnp.asarray(kinds, jnp.int32),
                        jnp.asarray(ids, jnp.int32), mega=mega, **kw)


def test_open_sets_phase_and_picks(st0):
    st, pack = _open(st0, [PK.K_CARD] * 5, [0, 1, 2, 3, 4])
    assert int(st.phase) == Phase.PACK_OPEN
    assert int(pack.picks_left) == 1
    _, pack2 = _open(st0, [PK.K_CARD] * 5, [0] * 5, mega=True)
    assert int(pack2.picks_left) == 2  # pack_open.py:151-155


def test_card_pick_joins_deck_with_modifiers(st0):
    # card id 14 = suit 1, rank 3 (canonical suit*13 + rank-2)
    st, pack = _open(st0, [PK.K_CARD] * 5, [14] * 5,
                     item_enh=jnp.full(5, 2, jnp.int32),
                     item_ed=jnp.full(5, 1, jnp.int32),
                     item_seal=jnp.full(5, 3, jnp.int32))
    st2, pack2, r = jax.jit(PK.step_pack)(st, pack, jnp.int32(SEL0))
    # +3 base +2 enh +3 edition +2 seal (pack_open.py:209-217)
    assert float(r) == 10.0
    assert int(st2.phase) == Phase.SHOP  # single pick completes the pack
    assert not bool(pack2.active)
    # joined the highest free slot (deck.append equivalent)
    new = np.asarray(st2.card_alive) & ~np.asarray(st.card_alive)
    (slot,) = np.flatnonzero(new)
    assert slot == 63
    assert int(st2.card_rank[slot]) == 3
    assert int(st2.card_suit[slot]) == 1
    assert int(st2.card_enh[slot]) == 2
    assert int(st2.card_ed[slot]) == 1
    assert int(st2.card_seal[slot]) == 3


def test_consumable_pick_rewards_by_family(st0):
    for cid, want in ((CL.TAROT_BASE + 4, 5.0),
                      (CL.PLANET_BASE + 2, 8.0),
                      (CL.SPECTRAL_BASE + 1, 10.0)):
        st, pack = _open(st0, [PK.K_CONSUMABLE] * 5, [cid] * 5)
        st2, _, r = PK.step_pack(st, pack, jnp.int32(SEL0 + 1))
        assert float(r) == want  # pack_open.py:226-231
        assert int(st2.cons_n) == int(st0.cons_n) + 1
        assert int(st2.cons[0]) == cid


def test_consumable_pick_full_slots_minus_one(st0):
    full = st0.replace(cons=jnp.full(5, CL.HERMIT, jnp.int32),
                       cons_n=st0.cons_slots)  # at capacity
    st, pack = _open(full, [PK.K_CONSUMABLE] * 5, [CL.HERMIT] * 5)
    st2, _, r = PK.step_pack(st, pack, jnp.int32(SEL0))
    assert float(r) == -1.0  # pack_open.py:232-234
    assert int(st2.cons_n) == int(full.cons_n)
    assert int(st2.phase) == Phase.SHOP  # the failed pick still counts


def test_joker_pick(st0):
    st, pack = _open(st0, [PK.K_JOKER] * 5, [31] * 5)
    st2, _, r = PK.step_pack(st, pack, jnp.int32(SEL0 + 2))
    assert float(r) == 15.0  # pack_open.py:240
    assert int(st2.joker_n) == 1
    assert int(st2.jokers[0]) == 31

    cap = st0.replace(jokers=jnp.full(5, 1, jnp.int32), joker_n=jnp.int32(5))
    st, pack = _open(cap, [PK.K_JOKER] * 5, [31] * 5)
    st2, _, r = PK.step_pack(st, pack, jnp.int32(SEL0))
    assert float(r) == -1.0  # pack_open.py:247-249
    assert int(st2.joker_n) == 5


def test_mega_two_picks_and_duplicate_rejected(st0):
    st, pack = _open(st0, [PK.K_CONSUMABLE] * 5,
                     [CL.TAROT_BASE + i for i in range(5)], mega=True)
    st, pack, r1 = PK.step_pack(st, pack, jnp.int32(SEL0))
    assert float(r1) == 5.0 and int(st.phase) == Phase.PACK_OPEN
    # duplicate selection -> -1, no state change (pack_open.py:81-82)
    st, pack, rd = PK.step_pack(st, pack, jnp.int32(SEL0))
    assert float(rd) == -1.0 and int(pack.picks_left) == 1
    st, pack, r2 = PK.step_pack(st, pack, jnp.int32(SEL0 + 3))
    assert float(r2) == 5.0
    assert int(st.phase) == Phase.SHOP and not bool(pack.active)
    assert int(st.cons_n) == 2


def test_skip_penalty(st0):
    st, pack = _open(st0, [PK.K_CARD] * 5, [0] * 5, mega=True)
    st2, pack2, r = PK.step_pack(st, pack, jnp.int32(Action.SKIP_PACK))
    assert float(r) == -2.0  # -1 x 2 remaining picks (pack_open.py:110-112)
    assert int(st2.phase) == Phase.SHOP and not bool(pack2.active)


def test_out_of_range_and_inactive(st0):
    st, pack = _open(st0, [PK.K_CARD] * 5, [0] * 5)
    _, _, r = PK.step_pack(st, pack, jnp.int32(0))  # not a pack action
    assert float(r) == -1.0
    st2, pack2, _ = PK.step_pack(st, pack, jnp.int32(Action.SKIP_PACK))
    _, _, r3 = PK.step_pack(st2, pack2, jnp.int32(SEL0))  # pack closed
    assert float(r3) == -1.0
