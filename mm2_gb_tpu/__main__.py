from mm2_gb_tpu.cli import main
import sys
sys.exit(main())
