"""Consumables (tarot / planet / spectral) as pure state transforms.

Mirrors ``ConsumableManager`` + ``TarotEffects`` + ``SpectralEffects``
(reference: balatro_gym/consumables.py:110-655) AS CONSUMED by the flagship
env's ``_use_consumable`` (balatro_env_2.py:1066-1172). That pipeline drops
or doubles several effects, and those quirks are the observable contract:

* Card mutations are synced back ONLY for enhancement/edition/seal
  (balatro_env_2.py:1122-1137) — Strength/Death/Star/Moon/Sun/World change
  rank/suit on throwaway wrappers, so they do NOTHING except yield reward.
* ``game_state['consumables']`` is the REAL list (state.py to_dict shares the
  reference), and the env appends ``items_created`` AGAIN after the effect
  (balatro_env_2.py:1156-1159) — so High Priestess / Judgement / Emperor
  creations are double-appended where slots allow. Reproduced exactly.
* Emperor creates tarots under their enum names ('THE_FOOL'), which the obs
  id-map doesn't know (→ id 0) but which still dispatch when used
  (consumables.py:634-638). Modelled as id+100 entries that observe as 0.
* The Hermit / Temperance money lands via ``result['money_gained']``; the
  mutation of the throwaway dict is lost (balatro_env_2.py:1097-1099).
* Ankh/Hex mutate a throwaway joker list; Ankh still pays the +15
  jokers-created reward, Hex pays nothing; neither changes jokers.
* Black Hole is a success-no-op (consumables.py:600-607 'would interact').
* Wraith's 'Drivers License' misspells the library's "Driver's License"
  (consumables.py:484 vs jokers.py:152) — that draw creates no joker but
  still costs -1 hand size and pays the reward.

INTENDED-SEMANTICS deviations (the reference CRASHES here — frozen Card
mutation or wrapper ``list.remove``: consumables.py:243-249, 389-460,
497-516, 581-593): The Hanged Man, Familiar, Grim, Incantation, Sigil,
Ouija and Cryptid are implemented per their documented intent (destroy /
create / convert) instead of raising; flagged for the parity ledger.

Reward shaping follows balatro_env_2.py:1090-1172: money/10, +10 planet,
+2/affected, +3/created card, +1/destroyed card, +15/created joker,
+5/created item; failure → -1 and the consumable is NOT consumed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.core import cards as C
from balatro_gym_tpu.core import rng as R

_F64 = jax.dtypes.canonicalize_dtype(jnp.float64)

# Consumable obs ids (balatro_env_2.py:1543-1567).
TAROT_BASE, NUM_TAROT = 1, 22
PLANET_BASE, NUM_PLANET = 30, 12
SPECTRAL_BASE, NUM_SPECTRAL = 50, 18
ENUMNAME_OFFSET = 100  # +100 ⇒ enum-name form, observes as 0

(FOOL, MAGICIAN, HIGH_PRIESTESS, EMPRESS, EMPEROR, HIEROPHANT, LOVERS,
 CHARIOT, STRENGTH, HERMIT, WHEEL, JUSTICE, HANGED_MAN, DEATH, TEMPERANCE,
 DEVIL, TOWER, STAR, MOON, SUN, JUDGEMENT, WORLD) = range(1, 23)

(FAMILIAR, GRIM, INCANTATION, TALISMAN, AURA, WRAITH, SIGIL, OUIJA,
 ECTOPLASM, IMMOLATE, ANKH, DEJA_VU, HEX, TRANCE, MEDIUM, CRYPTID,
 THE_SOUL, BLACK_HOLE) = range(50, 68)

# Enhancement applied to first-K selected cards per tarot (0 = not an
# enhancement tarot). (consumables.py:135-289)
_ENH_TAROT = np.zeros(23, np.int32)
_ENH_COUNT = np.zeros(23, np.int32)
for _t, _e, _k in [
    (MAGICIAN, C.Enhancement.LUCKY, 2), (EMPRESS, C.Enhancement.MULT, 2),
    (HIEROPHANT, C.Enhancement.BONUS, 2), (LOVERS, C.Enhancement.WILD, 1),
    (CHARIOT, C.Enhancement.STEEL, 1), (JUSTICE, C.Enhancement.GLASS, 1),
    (DEVIL, C.Enhancement.GOLD, 1), (TOWER, C.Enhancement.STONE, 1),
]:
    _ENH_TAROT[_t] = _e
    _ENH_COUNT[_t] = _k
ENH_TAROT = jnp.asarray(_ENH_TAROT)
ENH_COUNT = jnp.asarray(_ENH_COUNT)

# Seal applied by spectral cards (consumables.py:462-560) — BUG-FAITHFUL
# (#A42): SpectralEffects writes consumables.py's OWN Seal enum (RED=1,
# BLUE=2, GOLD=3, PURPLE=4; consumables.py:56-61), whose VALUES disagree
# with cards.py's (GOLD=1, RED=2, BLUE=3; cards.py:85-91) that the play
# path interprets. So Talisman's 'Gold' seal (3) behaves as a BLUE seal
# (planet on play), Deja Vu's 'Red' (1) as GOLD (+$3), Trance's 'Blue' (2)
# as RED (retrigger); only Medium's PURPLE (4) agrees. We store the
# value the reference stores — the cross-enum raw int — live-verified by
# the round-4 differential harness.
_SEAL_SPEC = np.zeros(68, np.int32)
for _s, _v in [(TALISMAN, C.Seal.BLUE),   # 'GOLD' in the consumables enum
               (DEJA_VU, C.Seal.GOLD),    # 'RED'
               (TRANCE, C.Seal.RED),      # 'BLUE'
               (MEDIUM, C.Seal.PURPLE)]:
    _SEAL_SPEC[_s] = _v
SEAL_SPEC = jnp.asarray(_SEAL_SPEC)

# Wraith rare-joker ids (consumables.py:482-486 ↔ jokers.py; 0 = the
# 'Drivers License' misspelling that matches nothing).
WRAITH_JOKERS = jnp.asarray(np.array(
    [137, 138, 139, 140, 0, 142, 143, 144, 145, 146, 147, 148, 149, 150],
    dtype=np.int32))
SOUL_JOKERS = jnp.asarray(np.array([146, 147, 148, 149, 150], dtype=np.int32))

EDITIONS3 = jnp.asarray(np.array(
    [C.Edition.FOIL, C.Edition.HOLOGRAPHIC, C.Edition.POLYCHROME],
    dtype=np.int32))
# Enhancement pool for Familiar/Grim/Incantation creations
# (consumables.py:397-399).
ENH_POOL7 = jnp.asarray(np.array(
    [C.Enhancement.BONUS, C.Enhancement.MULT, C.Enhancement.WILD,
     C.Enhancement.GLASS, C.Enhancement.STEEL, C.Enhancement.GOLD,
     C.Enhancement.LUCKY], dtype=np.int32))


def _fe():
    from balatro_gym_tpu.engine import full_env

    return full_env


def _first_k_selected(sel, k):
    """Mask of the first k True positions of sel ('target_cards[:k]')."""
    csum = jnp.cumsum(sel.astype(jnp.int32))
    return sel & (csum <= k)


def _hand_to_deck_mask(st, mask_hand):
    """[64] bool from a hand-position mask (one-hot matmul, no scatter)."""
    fe = _fe()
    H = fe._hand_onehot(st)[:mask_hand.shape[0]]
    return (mask_hand.astype(jnp.float32) @ H) > 0


def _apply_card_channel(st, sel_mask, table, value):
    """Write `value` into per-deck-slot channel `table` at selected slots."""
    return jnp.where(_hand_to_deck_mask(st, sel_mask), value, table)


def _append_cons(cons, cons_n, value, gate):
    """Append one consumable id if `gate` and a physical slot is free."""
    fe = _fe()
    can = gate & (cons_n < fe.MAX_CONS)
    pos = jnp.clip(cons_n, 0, fe.MAX_CONS - 1)
    return (jnp.where(can, cons.at[pos].set(value), cons),
            cons_n + jnp.where(can, 1, 0))


def _destroy_slots(st, kill64):
    """Mark deck slots dead and drop them from the hand (no refill —
    the reference never draws after consumable destruction)."""
    fe = _fe()
    alive = st.card_alive & ~kill64
    H10 = fe._hand_onehot(st)
    in_hand_dead = (H10 @ kill64.astype(jnp.float32)) > 0
    st = st.replace(card_alive=alive)
    return fe._remove_hand_positions(st, in_hand_dead)


def _create_cards(st, n, ranks_n, suits_n, enh_n):
    """Append up to n new cards into dead/unused deck slots.

    The reference appends to the END of the deck list, so created cards are
    drawn after every existing card. With stable slot identity, that means
    filling the HIGHEST free slots (descending), not the lowest — a freed
    mid-deck slot must not jump the draw queue. Reused slots also clear any
    stale Pillar played-this-round mark.
    """
    fe = _fe()
    free = ~st.card_alive
    # Count free slots from the top: csum_desc[s] = #free among slots >= s.
    csum_desc = jnp.cumsum(free[::-1].astype(jnp.int32))[::-1]
    take = free & (csum_desc <= n)  # highest free slots
    # k-th created card (k=0 first) goes to the k-th taken slot ascending.
    ordinal = jnp.where(take, jnp.cumsum(take.astype(jnp.int32)) - 1, n)
    O = (ordinal[:, None] == jnp.arange(4)).astype(jnp.float32)  # [64,4]
    pick = lambda vals: (O @ vals.astype(jnp.float32)).astype(jnp.int32)
    return st.replace(
        card_rank=jnp.where(take, pick(ranks_n), st.card_rank),
        card_suit=jnp.where(take, pick(suits_n), st.card_suit),
        card_enh=jnp.where(take, pick(enh_n), st.card_enh),
        card_ed=jnp.where(take, 0, st.card_ed),
        card_seal=jnp.where(take, 0, st.card_seal),
        card_alive=st.card_alive | take,
        boss_played_slots=jnp.where(take, False, st.boss_played_slots),
    )


def _consumable_rolls(key, st):
    """Every chance outcome ``use_consumable`` can consume, as one bundle.

    Module-level seam (monkeypatchable like ``full_env._play_rolls``) so the
    live differential-replay harness can force the reference's recorded
    consumable outcomes (tests/test_reference_differential.py). The default
    draws reproduce the original inline ``jax.random`` sequence bit-exactly
    — same split tree, same per-key draw order (including the deliberate
    k1 reuse between Aura and Wheel) — so the jnp engine and the fused
    kernel's ops/kernel_rng mirror are unchanged.

    Familiar/Grim/Incantation rank pools: the original drew BOTH the
    face-rank (0..3) and number-rank (0..9) variants from the same per-lane
    key inside a cid-select; both pools are returned and the caller selects
    by cid, which is the identical computation.
    """
    fe = _fe()
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ks4 = jax.random.split(k4, 4)
    return {
        # Aura / Wheel of Fortune (consumables.py:220-231, 473-480)
        "aura_ed": EDITIONS3[jax.random.randint(k1, (), 0, 3)],
        "wheel_fired": jax.random.uniform(k1) < 0.25,
        "wheel_ed": EDITIONS3[jax.random.randint(k2, (), 0, 3)],
        # High Priestess / Judgement planets, Emperor tarots, Fool copy
        "planet9": PLANET_BASE + jax.random.randint(k2, (2,), 0, 9,
                                                    dtype=jnp.int32),
        "tarot22": ENUMNAME_OFFSET + TAROT_BASE + jax.random.randint(
            k2, (2,), 0, 22, dtype=jnp.int32),
        "fool_pick": st.cons[jax.random.randint(
            k2, (), 0, jnp.maximum(1, st.cons_n), dtype=jnp.int32)],
        # Wraith / The Soul joker draws (consumables.py:482-486, 597-606)
        "wraith_id": WRAITH_JOKERS[jax.random.randint(k3, (), 0, 14,
                                                      dtype=jnp.int32)],
        "soul_id": SOUL_JOKERS[jax.random.randint(k3, (), 0, 5,
                                                  dtype=jnp.int32)],
        # Familiar/Grim/Incantation creation pools (consumables.py:389-460)
        "rank3_pool": 11 + jax.vmap(lambda k: jax.random.randint(
            k, (), 0, 3, dtype=jnp.int32))(ks4),
        "rank9_pool": 2 + jax.vmap(lambda k: jax.random.randint(
            k, (), 0, 9, dtype=jnp.int32))(ks4),
        "suit_pool": jax.random.randint(jax.random.fold_in(k4, 9), (4,), 0, 4,
                                        dtype=jnp.int32),
        "enh_pool": ENH_POOL7[jax.random.randint(
            jax.random.fold_in(k4, 10), (4,), 0, 7, dtype=jnp.int32)],
        # Sigil / Ouija conversions (consumables.py:497-516)
        "conv_suit": jax.random.randint(k3, (), 0, 4, dtype=jnp.int32),
        "conv_rank": 2 + jax.random.randint(k3, (), 0, 13, dtype=jnp.int32),
        # Immolate destruction priorities (consumables.py:518-530)
        "immo_bits": jax.random.bits(k3, (fe.MAX_DECK,), jnp.uint32),
    }


def use_consumable(st, idx):
    """USE_CONSUMABLE action body. Returns (state, reward).

    idx: consumable slot 0..4 (pre-masked to < cons_n).
    """
    fe = _fe()
    st_in = st
    idx = jnp.clip(idx, 0, fe.MAX_CONS - 1)
    raw = st.cons[idx]
    cid = jnp.where(raw >= ENUMNAME_OFFSET, raw - ENUMNAME_OFFSET, raw)

    ranks, suits, enh, ed, seal, present = fe._hand_card_view(st)
    sel = st.selected & present
    n_sel = jnp.sum(sel).astype(jnp.int32)

    key, st = fe._stream(st, "consumable_effects")
    rolls = _consumable_rolls(key, st)

    reward = jnp.zeros((), _F64 if jax.config.jax_enable_x64 else jnp.float32)
    success = jnp.zeros((), bool)
    F = reward.dtype

    is_tarot = (cid >= TAROT_BASE) & (cid < TAROT_BASE + NUM_TAROT)
    is_planet = (cid >= PLANET_BASE) & (cid < PLANET_BASE + NUM_PLANET)
    is_spectral = (cid >= SPECTRAL_BASE) & (cid < SPECTRAL_BASE + NUM_SPECTRAL)

    # ---- enhancement tarots + seal spectrals (sel-targeted writes) ----
    enh_val = ENH_TAROT[jnp.clip(cid, 0, 22) * is_tarot]
    enh_k = ENH_COUNT[jnp.clip(cid, 0, 22) * is_tarot]
    tgt_enh = _first_k_selected(sel, enh_k)
    do_enh = is_tarot & (enh_val > 0) & (n_sel >= 1)
    st = st.replace(card_enh=jnp.where(
        do_enh, _apply_card_channel(st, tgt_enh, st.card_enh, enh_val), st.card_enh))
    reward += jnp.where(do_enh, 2.0 * jnp.sum(tgt_enh).astype(F), 0.0)
    success |= do_enh

    seal_val = SEAL_SPEC[jnp.clip(cid, 0, 67) * is_spectral]
    tgt_seal = _first_k_selected(sel, 1)
    do_seal = is_spectral & (seal_val > 0) & (n_sel >= 1)
    st = st.replace(card_seal=jnp.where(
        do_seal, _apply_card_channel(st, tgt_seal, st.card_seal, seal_val), st.card_seal))
    reward += jnp.where(do_seal, 2.0, 0.0)
    success |= do_seal

    # ---- Aura: random edition on first selected (consumables.py:473-480) --
    do_aura = (cid == AURA) & (n_sel >= 1)
    aura_ed = rolls["aura_ed"]
    st = st.replace(card_ed=jnp.where(
        do_aura, _apply_card_channel(st, tgt_seal, st.card_ed, aura_ed), st.card_ed))
    reward += jnp.where(do_aura, 2.0, 0.0)
    success |= do_aura

    # ---- Wheel of Fortune: 25% random edition (consumables.py:220-231) ---
    fired = rolls["wheel_fired"]
    do_wheel = (cid == WHEEL) & (n_sel >= 1) & fired
    wheel_ed = rolls["wheel_ed"]
    st = st.replace(card_ed=jnp.where(
        do_wheel, _apply_card_channel(st, tgt_seal, st.card_ed, wheel_ed), st.card_ed))
    reward += jnp.where(do_wheel, 2.0, 0.0)
    success |= do_wheel

    # ---- no-op-with-reward tarots (rank/suit sync is dropped) ------------
    do_strength = (cid == STRENGTH) & (n_sel >= 1)
    n_strength = jnp.sum(_first_k_selected(sel, 2) & (ranks < 14)).astype(F)
    reward += jnp.where(do_strength, 2.0 * n_strength, 0.0)
    success |= do_strength
    do_death = (cid == DEATH) & (n_sel >= 2)
    reward += jnp.where(do_death, 4.0, 0.0)
    success |= do_death
    is_suit_conv = (cid == STAR) | (cid == MOON) | (cid == SUN) | (cid == WORLD)
    do_conv = is_suit_conv & (n_sel >= 1)
    reward += jnp.where(do_conv, 2.0 * jnp.minimum(3, n_sel).astype(F), 0.0)
    success |= do_conv

    # ---- money tarots ----------------------------------------------------
    hermit_gain = jnp.minimum(jnp.maximum(st.money, 0), 20)
    do_hermit = cid == HERMIT
    temper_gain = jnp.minimum(5 * st.joker_n, 50)
    do_temper = cid == TEMPERANCE
    gain = jnp.where(do_hermit, hermit_gain, jnp.where(do_temper, temper_gain, 0))
    st = st.replace(money=st.money + gain.astype(jnp.int32))
    reward += gain.astype(F) / 10.0
    success |= do_hermit | do_temper

    # ---- planet ----------------------------------------------------------
    pidx = jnp.clip(cid - PLANET_BASE, 0, 11)
    from balatro_gym_tpu.core.constants import PLANET_HAND

    pht = PLANET_HAND[pidx]
    st = st.replace(hand_levels=jnp.where(
        is_planet, st.hand_levels.at[pht].add(1), st.hand_levels))
    reward += jnp.where(is_planet, 10.0, 0.0)
    success |= is_planet

    # ---- consumable-creating tarots (double-append quirk) ----------------
    # In-effect appends are gated by len(consumables) < slots WITH the used
    # card still in the list; the env then re-appends items_created under the
    # same gate after the pop (balatro_env_2.py:1094,1156-1159).
    slots_gate1 = st.cons_n < st.cons_slots          # first in-effect append
    slots_gate2 = st.cons_n + 1 < st.cons_slots      # second in-effect append
    planet9 = rolls["planet9"]
    tarot22 = rolls["tarot22"]
    fool_pick = rolls["fool_pick"]

    do_hp = cid == HIGH_PRIESTESS
    do_emp = cid == EMPEROR
    do_judge = cid == JUDGEMENT
    do_fool = (cid == FOOL) & (st.cons_n > 0)

    make_two = do_hp | do_emp
    vals = jnp.where(do_emp, tarot22, planet9)
    c0, n0 = st.cons, st.cons_n
    c1, n1 = _append_cons(c0, n0, vals[0], make_two & slots_gate1)
    c2, n2 = _append_cons(c1, n1, vals[1], make_two & slots_gate2 & (n1 > n0))
    c3, n3 = _append_cons(c2, n2, planet9[0], do_judge & slots_gate1)
    # The Fool: unconditional in-list append (no slot check,
    # consumables.py:127-133), physical cap only.
    c4, n4 = _append_cons(c3, n3, fool_pick, do_fool)
    st = st.replace(cons=c4, cons_n=n4)
    items1 = (n1 > n0).astype(jnp.int32) + (n2 > n1) + (n3 > n2)  # items_created
    fool_items = (n4 > n3).astype(jnp.int32)
    reward += jnp.where(make_two | do_judge, 5.0 * items1.astype(F), 0.0)
    # Fool reward: items_created counts the copy (balatro_env_2.py:1156-1160).
    reward += jnp.where(do_fool, 5.0 * fool_items.astype(F), 0.0)
    success |= make_two | do_judge | do_fool
    # Env re-append applies to EVERY consumable's items_created, including
    # the Fool's copy (balatro_env_2.py:1156-1159) — the self-duplicating
    # Fool quirk.
    pending = jnp.where(make_two | do_judge, items1,
                        jnp.where(do_fool, fool_items, 0))
    pending_vals = jnp.stack([
        jnp.where(do_fool, fool_pick,
                  jnp.where(do_judge, planet9[0], vals[0])), vals[1]])

    # ---- joker-creating spectrals ---------------------------------------
    jslot_free = st.joker_n < st.joker_slots
    do_wraith = (cid == WRAITH) & jslot_free
    do_soul = (cid == THE_SOUL) & jslot_free
    wid = rolls["wraith_id"]
    sid = rolls["soul_id"]
    new_jid = jnp.where(do_soul, sid, wid)
    add_joker = (do_wraith | do_soul) & (new_jid > 0)
    jpos = jnp.clip(st.joker_n, 0, fe.MAX_JOKERS - 1)
    st = st.replace(
        jokers=jnp.where(add_joker, st.jokers.at[jpos].set(new_jid), st.jokers),
        joker_n=st.joker_n + jnp.where(add_joker, 1, 0))
    reward += jnp.where(do_wraith | do_soul, 15.0, 0.0)
    success |= do_wraith | do_soul

    # ---- hand-size modifiers --------------------------------------------
    do_ecto = (cid == ECTOPLASM) & (st.joker_n > 0)
    do_ouija = (cid == OUIJA) & (st.hand_n > 0)
    hs_delta = jnp.where(do_wraith | do_ecto | do_ouija, -1, 0)
    st = st.replace(hand_size=st.hand_size + hs_delta)
    success |= do_ecto

    # ---- Ankh / Hex / Black Hole (net no-ops, reward quirks) -------------
    do_ankh = (cid == ANKH) & (st.joker_n > 0)
    reward += jnp.where(do_ankh, 15.0, 0.0)
    success |= do_ankh
    do_hex = (cid == HEX) & (st.joker_n > 0)
    success |= do_hex
    success |= cid == BLACK_HOLE

    # ---- destruction/creation (intended semantics; reference crashes) ----
    # Hanged Man: destroy up to 2 selected.
    do_hang = (cid == HANGED_MAN) & (n_sel >= 1)
    hang_tgt = _first_k_selected(sel, 2)
    kill64 = _hand_to_deck_mask(st, hang_tgt)
    hanged = _destroy_slots(st, kill64)
    st = jax.tree.map(lambda a, b: jnp.where(do_hang, a, b), hanged, st)
    reward += jnp.where(do_hang, 2.0 * jnp.sum(hang_tgt).astype(F), 0.0)
    success |= do_hang

    # Familiar/Grim/Incantation: destroy first selected, create N cards.
    is_fgi = (cid == FAMILIAR) | (cid == GRIM) | (cid == INCANTATION)
    do_fgi = is_fgi & (n_sel >= 1)
    n_create = jnp.where(cid == FAMILIAR, 3, jnp.where(cid == GRIM, 2, 4))
    rank_pool = jnp.where(
        cid == FAMILIAR, rolls["rank3_pool"],
        jnp.where(cid == GRIM, 14, rolls["rank9_pool"]))
    suit_pool = rolls["suit_pool"]
    enh_pool = rolls["enh_pool"]
    kill1 = _hand_to_deck_mask(st, tgt_seal)
    fgi_st = _create_cards(_destroy_slots(st, kill1), n_create,
                           rank_pool, suit_pool, enh_pool)
    st = jax.tree.map(lambda a, b: jnp.where(do_fgi, a, b), fgi_st, st)
    reward += jnp.where(do_fgi, 3.0 * n_create.astype(F) + 1.0, 0.0)
    success |= do_fgi

    # Sigil / Ouija: convert the whole hand's suit/rank (intended).
    do_sigil = (cid == SIGIL) & (st.hand_n > 0)
    conv_suit = rolls["conv_suit"]
    conv_rank = rolls["conv_rank"]
    hand_mask64 = _hand_to_deck_mask(
        st, jnp.arange(fe.MAX_HAND) < st.hand_n)
    st = st.replace(
        card_suit=jnp.where(do_sigil & hand_mask64, conv_suit, st.card_suit),
        card_rank=jnp.where(do_ouija & hand_mask64, conv_rank, st.card_rank),
    )
    reward += jnp.where(do_sigil | do_ouija, 2.0 * st.hand_n.astype(F), 0.0)
    success |= do_sigil | do_ouija

    # Immolate: destroy 5 random alive cards, +$20 (consumables.py:518-530).
    # Uniform-without-replacement via top-5 of iid uniform PACKED priority
    # words (integer keys so the fused kernel replays the draws bit-exactly
    # via ops/kernel_rng). The word packs key25 (bits 31-7) | 127-slot
    # (bits 6-0): the unique slot payload makes every word distinct (no
    # ties) and strictly positive (never the I32_MIN dead sentinel), which
    # lets the fused kernel run ONE top-5 min/max insertion cascade instead
    # of five argmax+knockout passes (ops/fused_full_rollout mirrors these
    # words bit-for-bit). Key truncation 32->25 bits biases key-ties toward
    # lower slots with P ~ (64^2/2)*2^-25 ~ 6e-5 per use — negligible.
    do_immo = cid == IMMOLATE
    # Sign-flipped i32 ordering (core.rng.sort_key_i32): u32 argmax
    # mis-orders on XLA:TPU inside fused programs; i32 is what the fused
    # kernel compares too, keeping backends bit-identical.
    g = R.sort_key_i32(
        (rolls["immo_bits"] & jnp.uint32(0xFFFFFF80))
        | (jnp.uint32(127) - jnp.arange(fe.MAX_DECK, dtype=jnp.uint32)),
        st.card_alive)
    # Iterated argmax (top_k lowers to a sort on TPU; this runs every step).
    n_kill = jnp.minimum(5, jnp.sum(st.card_alive))
    immo_kill = jnp.zeros(fe.MAX_DECK, bool)
    gk = g
    for i in range(5):
        j = jnp.argmax(gk)
        # Compare+OR, NOT `.at[j].max(bool)`: XLA:TPU's bool scatter-max
        # silently DROPS updates inside vmapped programs (repro in
        # scripts/debug_fused_case.py history — TPU kept picks 1/3/5 of an
        # iterated argmax and lost 2/4, while CPU kept all five). The OR
        # keeps an earlier True if a degenerate all-min argmax re-picks
        # slot 0 when fewer than 5 cards are alive.
        immo_kill = immo_kill | ((jnp.arange(fe.MAX_DECK) == j) & (i < n_kill))
        gk = gk.at[j].set(jnp.int32(R.I32_MIN))
    immo_kill = immo_kill & st.card_alive
    immo_st = _destroy_slots(st, immo_kill)
    immo_st = immo_st.replace(money=immo_st.money + 20)
    st = jax.tree.map(lambda a, b: jnp.where(do_immo, a, b), immo_st, st)
    reward += jnp.where(do_immo, jnp.sum(immo_kill).astype(F) + 2.0, 0.0)
    success |= do_immo

    # Cryptid: 2 copies of first selected card (intended).
    do_cryptid = (cid == CRYPTID) & (n_sel >= 1)
    first8 = _first_k_selected(sel, 1).astype(jnp.float32)
    H8 = _fe()._hand_onehot(st)[:8]
    row = first8 @ H8  # [64] one-hot of the source slot
    cr = jnp.full(4, (row @ st.card_rank.astype(jnp.float32)).astype(jnp.int32))
    cs = jnp.full(4, (row @ st.card_suit.astype(jnp.float32)).astype(jnp.int32))
    ce = jnp.full(4, (row @ st.card_enh.astype(jnp.float32)).astype(jnp.int32))
    cryptid_st = _create_cards(st, 2, cr, cs, ce)
    st = jax.tree.map(lambda a, b: jnp.where(do_cryptid, a, b), cryptid_st, st)
    reward += jnp.where(do_cryptid, 6.0, 0.0)
    success |= do_cryptid

    # ---- consume on success: pop slot idx, then env re-append ------------
    slots5 = jnp.arange(fe.MAX_CONS)
    shifted = st.cons[jnp.clip(slots5 + 1, 0, fe.MAX_CONS - 1)]
    popped = jnp.where(slots5 < idx, st.cons, shifted)
    popped = jnp.where(slots5 >= st.cons_n - 1, 0, popped)
    st = st.replace(
        cons=jnp.where(success, popped, st.cons),
        cons_n=st.cons_n - jnp.where(success, 1, 0))
    # Env re-append of items_created (gated len < slots, post-pop).
    c, n = st.cons, st.cons_n
    c, n = _append_cons(c, n, pending_vals[0], (pending >= 1) & (n < st.cons_slots))
    c, n = _append_cons(c, n, pending_vals[1], (pending >= 2) & (n < st.cons_slots))
    st = st.replace(cons=c, cons_n=n)

    # Selection cleared in both branches (balatro_env_2.py:1171).
    st = st.replace(selected=jnp.zeros(fe.SEL, bool))
    st = jax.tree.map(lambda a, b: jnp.where(success, a, b),
                      st, st_in.replace(selected=jnp.zeros(fe.SEL, bool),
                                        rng_counters=st.rng_counters))
    reward = jnp.where(success, reward, -1.0)
    return st, reward
