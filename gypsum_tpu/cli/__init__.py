"""gypsum-tpu command-line interface (package; was a 1,261-line module).

``from gypsum_tpu.cli import main`` remains the console-script entry
(pyproject.toml) and the ``python -m gypsum_tpu`` target."""

from gypsum_tpu.cli.main import main  # noqa: F401
from gypsum_tpu.cli.acquire import cmd_acquire  # noqa: F401
from gypsum_tpu.cli.replay import cmd_replay  # noqa: F401
from gypsum_tpu.cli.rtk import cmd_rtk  # noqa: F401
from gypsum_tpu.cli.synth import cmd_synth  # noqa: F401
