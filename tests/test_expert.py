"""Expert policy: exhaustive play search beats a random policy and always
emits legal actions."""
import jax
import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.engine import full_env as fe
from balatro_gym_tpu.train.expert import best_play, expert_action, rollout_expert


def test_expert_actions_always_legal():
    st = fe.reset(jax.random.key(0))
    step = jax.jit(fe.step)
    act = jax.jit(expert_action)
    for _ in range(40):
        a = int(act(st))
        mask = np.asarray(fe.action_mask(st))
        assert mask[a], (a, np.flatnonzero(mask), int(st.phase))
        st, r, done = step(st, jnp.int32(a))
        assert float(r) >= 0 or done, f"expert took penalized action {a}"
        if done:
            break


def test_best_play_finds_flush():
    st = fe.reset(jax.random.key(1))
    st, _, _ = jax.jit(fe.step)(st, jnp.int32(45))
    # Plant a flush in positions 0-4 amid junk.
    ranks = np.array(st.card_rank)
    suits = np.array(st.card_suit)
    idx = np.asarray(st.hand_idx)
    for i, (r, s) in enumerate([(2, 3), (5, 3), (9, 3), (11, 3), (13, 3),
                                (4, 0), (7, 1), (10, 2)]):
        ranks[idx[i]], suits[idx[i]] = r, s
    st = st.replace(card_rank=jnp.asarray(ranks), card_suit=jnp.asarray(suits))
    mask, score = jax.jit(best_play)(st)
    assert np.asarray(mask)[:5].all() and not np.asarray(mask)[5:].any()
    # Flush: (35 + 2+5+9+10+10) * 4 = 284.
    assert int(score) == 284


def test_expert_outperforms_random():
    _, expert_total, _, expert_ante = jax.jit(
        rollout_expert, static_argnums=(1, 2))(jax.random.key(0), 8, 30)
    # Random baseline on the same envs.
    states = jax.vmap(fe.reset)(jax.random.split(jax.random.key(0), 8))

    def body(carry, k):
        sts, tot = carry
        ks = jax.random.split(k, 8)

        def rand_act(st, kk):
            m = fe.action_mask(st)
            return jax.random.categorical(kk, jnp.where(m, 0.0, -jnp.inf))

        acts = jax.vmap(rand_act)(sts, ks)
        sts, rew, done = jax.vmap(fe.step_autoreset)(sts, acts)
        return (sts, tot + jnp.sum(rew)), None

    (states, rand_total), _ = jax.lax.scan(
        body, (states, jnp.zeros((), jnp.float32)),
        jax.random.split(jax.random.key(9), 30))
    assert float(expert_total) > float(rand_total)
