from .parse import CompiledLogParser  # noqa: F401
from .header import CompiledRuleSet  # noqa: F401
from .statement import compile_actions  # noqa: F401
