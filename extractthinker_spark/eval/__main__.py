"""``python -m extractthinker_spark.eval`` — the reference's
``extract_thinker.eval.cli`` console entry (cli.py:146-151)."""

from extractthinker_spark.eval.cli import main

raise SystemExit(main())
