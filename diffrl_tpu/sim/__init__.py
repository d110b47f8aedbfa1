from .model import (
    GEO_BOX,
    GEO_CAPSULE,
    GEO_MESH,
    GEO_NONE,
    GEO_PLANE,
    GEO_SDF,
    GEO_SPHERE,
    JOINT_BALL,
    JOINT_FIXED,
    JOINT_FREE,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    Mesh,
    Model,
    ModelBuilder,
    State,
    Topology,
)
from .articulation import (
    DynamicsAux,
    articulation_substep,
    coupled_substep,
    eval_fk,
    eval_ground_contacts,
    eval_id,
    eval_mass_matrix,
    eval_muscles,
    eval_tau,
    simulate,
    simulate_xpbd,
)
from .integrators import SemiImplicitIntegrator, XPBDIntegrator
from . import particles
