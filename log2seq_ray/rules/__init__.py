from . import actions, items, presets  # noqa: F401
from .header import HeaderRule  # noqa: F401
from .items import RuleDefinitionError  # noqa: F401
