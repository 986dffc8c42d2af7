#!/usr/bin/env python
"""Top-level entry point matching the reference CLI:

    python run_finetuning_taskonomy.py -c cfgs/finetune/taskonomy/<config>.yaml [...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multimae_tpu.cli.run_finetuning_taskonomy import get_args, main

if __name__ == "__main__":
    opts = get_args()
    if opts.output_dir:
        os.makedirs(opts.output_dir, exist_ok=True)
    main(opts)
