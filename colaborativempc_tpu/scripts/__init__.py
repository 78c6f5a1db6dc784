"""Experiment / analysis CLI entry points.

The installable counterparts of the reference's ``planner/scripts/*`` battery
(reference ``planner/lib/setup.py:1-9`` ships ``plan_lib`` as an editable
package; the scripts themselves stayed loose files there). Here every script
is a console entry point declared in ``pyproject.toml`` and the repo-root
``scripts/*.py`` files are thin forwarders for in-tree use.
"""
