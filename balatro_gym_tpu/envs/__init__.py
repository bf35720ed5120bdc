"""Gym-compatible environment shells (host-side, jitted device cores)."""
from balatro_gym_tpu.envs.balatro_env import (  # noqa: F401
    BalatroEnvValidator,
    BalatroGymEnv,
    make_balatro_env,
)
from balatro_gym_tpu.envs.eight_card_draw import (  # noqa: F401
    EightCardDrawGymEnv,
    make,
)
