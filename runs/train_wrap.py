"""Trainer entry with periodic stack dumps (diagnose slow/stalled phases)."""
import faulthandler, sys
faulthandler.dump_traceback_later(300, repeat=True, file=sys.stderr)
from divshot_tpu.apps.train import main
sys.exit(main())
