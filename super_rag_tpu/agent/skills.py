"""Progressive agent skills (L1-L4 loading).

Counterpart of the reference's AgentSkill system
(agent_pro/agent_skill.py:29-38): a skill exposes progressively more
detail as the agent engages with it —

  L1 name only            (always in the prompt; costs ~nothing)
  L2 + one-line description
  L3 + full instructions  (loaded when the agent invokes the skill)
  L4 + bound tools        (registered into the session's tool registry)

Skills are plain dataclasses or markdown files with frontmatter, loaded
from a directory (``.skills/`` by default).
"""

from __future__ import annotations

import logging
import os
import re
from dataclasses import dataclass, field
from typing import Optional

from super_rag_tpu.agent.runtime import Tool, ToolRegistry

logger = logging.getLogger(__name__)

_FRONTMATTER = re.compile(r"^---\n(.*?)\n---\n(.*)$", re.S)


@dataclass
class AgentSkill:
    name: str
    description: str = ""
    instructions: str = ""
    tools: list[Tool] = field(default_factory=list)

    def render(self, level: int) -> str:
        """Prompt text for a given disclosure level."""
        if level <= 1 or not self.description:
            return f"- {self.name}"
        if level == 2 or not self.instructions:
            return f"- {self.name}: {self.description}"
        return (f"## Skill: {self.name}\n{self.description}\n\n"
                f"{self.instructions}")


def parse_skill_markdown(text: str, default_name: str = "skill") -> AgentSkill:
    """Markdown skill file: optional `key: value` frontmatter + body."""
    m = _FRONTMATTER.match(text)
    meta: dict[str, str] = {}
    body = text
    if m:
        for line in m.group(1).splitlines():
            k, _, v = line.partition(":")
            if _:
                meta[k.strip()] = v.strip()
        body = m.group(2).strip()
    return AgentSkill(
        name=meta.get("name", default_name),
        description=meta.get("description", ""),
        instructions=body,
    )


class SkillLibrary:
    def __init__(self, skills: Optional[list[AgentSkill]] = None):
        self._skills: dict[str, AgentSkill] = {
            s.name: s for s in (skills or [])
        }
        self._engaged: set[str] = set()  # escalated to L3/L4

    @classmethod
    def from_directory(cls, path: str) -> "SkillLibrary":
        skills = []
        if os.path.isdir(path):
            for fn in sorted(os.listdir(path)):
                if not fn.endswith(".md"):
                    continue
                with open(os.path.join(path, fn)) as f:
                    skills.append(
                        parse_skill_markdown(f.read(), default_name=fn[:-3])
                    )
        return cls(skills)

    def add(self, skill: AgentSkill) -> None:
        self._skills[skill.name] = skill

    def engage(self, name: str, registry: Optional[ToolRegistry] = None) -> Optional[AgentSkill]:
        """Escalate a skill to full disclosure; bind its tools (L4)."""
        skill = self._skills.get(name)
        if skill is None:
            return None
        self._engaged.add(name)
        if registry is not None:
            for t in skill.tools:
                registry.add(t)
        return skill

    def prompt_section(self) -> str:
        """Progressive prompt: engaged skills at L3+, others at L2."""
        if not self._skills:
            return ""
        lines = ["Available skills (reply with "
                 '{"tool": "use_skill", "arguments": {"name": "<skill>"}} '
                 "to load one):"]
        for s in self._skills.values():
            lines.append(s.render(3 if s.name in self._engaged else 2))
        return "\n".join(lines)

    def as_tool(self, registry: ToolRegistry) -> Tool:
        """The use_skill tool the agent calls to escalate a skill."""

        def use_skill(name: str):
            skill = self.engage(name, registry)
            if skill is None:
                return {"error": f"unknown skill {name!r}",
                        "available": sorted(self._skills)}
            return {"name": skill.name, "instructions": skill.instructions,
                    "tools_added": [t.name for t in skill.tools]}

        return Tool(
            "use_skill",
            "Load a skill's full instructions and bind its tools",
            {"type": "object", "properties": {"name": {"type": "string"}},
             "required": ["name"]},
            use_skill,
        )
