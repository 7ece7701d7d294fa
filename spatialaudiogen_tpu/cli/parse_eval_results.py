"""Result aggregator CLI (parity with reference parse_eval_results.py).

    python -m spatialaudiogen_tpu.cli.parse_eval_results EVAL_DETAILED_TXT
"""

from spatialaudiogen_tpu.eval.parse_results import main

if __name__ == "__main__":
    main()
