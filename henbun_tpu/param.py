"""`hb.param` API surface: re-exports the parameter-tree core
(cf. `/root/reference/Henbun/param.py`)."""
from .core.param import (
    graph_key,
    Parentable,
    Variable,
    Parameterized,
    ParamList,
    Data,
    MinibatchData,
)
