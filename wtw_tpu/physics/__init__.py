from .state import PhysicsState, ContactInfo  # noqa: F401
from .heightfield import HeightField, flat_heightfield  # noqa: F401
from .engine import EngineParams, fk, physics_step  # noqa: F401
