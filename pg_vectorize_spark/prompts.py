"""Prompt registry — the ``vectorize.prompts`` table re-expressed.

The reference's prompts table (extension/sql/meta.sql:9-13) is
user-insertable: ``(prompt_type UNIQUE, sys_prompt, user_prompt)`` with the
seeded ``question_answer`` row (meta.sql:50-59). This registry mirrors that:
a JSON file per workspace seeded with the defaults, plus add/get/list/
delete — so ``rag(task='my_custom_task')`` round-trips a user-registered
template exactly like an INSERT into vectorize.prompts would.

Templates use the same ``{{ context_str }}`` / ``{{ query_str }}``
placeholders the Handlebars renderer consumes (extension/src/chat/
ops.rs:128-136); registration validates that user_prompt references both so
a broken template fails at insert time, not at query time.
"""

from __future__ import annotations

import json
import os
import tempfile

from pg_vectorize_spark.errors import VectorizeError
from pg_vectorize_spark.rag import DEFAULT_PROMPTS, _PLACEHOLDER_RE
from pg_vectorize_spark.validate import check_input

_REQUIRED_VARS = {"context_str", "query_str"}


class PromptRegistry:
    def __init__(self, workspace_dir: str):
        self.workspace_dir = workspace_dir
        self._path = os.path.join(workspace_dir, "prompts.json")
        self._cache: dict[str, dict[str, str]] | None = None

    def _load(self) -> dict[str, dict[str, str]]:
        if self._cache is None:
            try:
                with open(self._path) as f:
                    self._cache = json.load(f)
            except FileNotFoundError:
                # seeded rows (meta.sql:50-59 ON CONFLICT DO NOTHING)
                self._cache = {k: dict(v) for k, v in DEFAULT_PROMPTS.items()}
        return self._cache

    def _save(self) -> None:
        os.makedirs(self.workspace_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.workspace_dir, prefix="prompts.")
        with os.fdopen(fd, "w") as f:
            json.dump(self._load(), f, indent=1)
        os.replace(tmp, self._path)

    def add(
        self,
        task: str,
        sys_prompt: str,
        user_prompt: str,
        replace: bool = False,
    ) -> None:
        """INSERT INTO vectorize.prompts — validates the identifier and that
        the user template references {{ context_str }} and {{ query_str }}."""
        check_input(task)
        placeholders = set(_PLACEHOLDER_RE.findall(user_prompt))
        missing = _REQUIRED_VARS - placeholders
        if missing:
            raise VectorizeError(
                f"user_prompt must reference {sorted(_REQUIRED_VARS)}; "
                f"missing {sorted(missing)}"
            )
        prompts = self._load()
        if task in prompts and not replace:
            raise VectorizeError(
                f"prompt task already exists: {task!r} (pass replace=True)"
            )
        prompts[task] = {"sys_prompt": sys_prompt, "user_prompt": user_prompt}
        self._save()

    def get(self, task: str) -> dict[str, str]:
        prompts = self._load()
        if task not in prompts:
            raise VectorizeError(f"unknown prompt task: {task}")
        return dict(prompts[task])

    def delete(self, task: str) -> bool:
        if task in DEFAULT_PROMPTS:
            raise VectorizeError(f"cannot delete seeded prompt: {task!r}")
        prompts = self._load()
        if task in prompts:
            del prompts[task]
            self._save()
            return True
        return False

    def list_tasks(self) -> list[str]:
        return sorted(self._load())

    def all(self) -> dict[str, dict[str, str]]:
        return {k: dict(v) for k, v in self._load().items()}
