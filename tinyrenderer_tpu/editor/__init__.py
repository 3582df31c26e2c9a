"""Editor subsystem: reflection params, input events, picking, gizmo,
player controller, app session."""

from .controller import Action, CameraInputController, PlayerController  # noqa: F401
from .gizmo import Gizmo, GizmoHandler  # noqa: F401
from .picking import PickReadbackManager  # noqa: F401
from .session import EditorApp  # noqa: F401
