import sys; sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
from reconstruction_tpu.__main__ import main
sys.exit(main(["prog"] + sys.argv[1:]))
