# Developer workflows (see .claude/skills/verify/SKILL.md for details)

.PHONY: test verify verify-all bench plans gallery

test:
	python -m pytest tests/ -q

verify:
	python tools/verify_oracle.py

verify-all:
	python tools/verify_oracle.py /root/testdata/sf0.001
	python tools/verify_oracle.py /root/testdata/sf0.01
	python tools/verify_oracle.py /root/testdata/sf0.1

bench:
	python bench.py

plans:
	python tools/explain_plans.py

gallery:
	python tools/run_gallery.py
