"""Prompt templates: detection, application, multi-turn chat rendering.

Capability parity with ``bitnet-prompt-templates``
(``src/lib.rs:77-3103``): template types with auto-detection from GGUF
metadata / model name / embedded jinja, ``apply`` for single prompts,
``render_chat`` for message lists, per-template stop sequences and BOS
policy.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


class TemplateType(enum.Enum):
    RAW = "raw"
    INSTRUCT = "instruct"
    LLAMA3_CHAT = "llama3-chat"
    CHATML = "chatml"
    MISTRAL_INSTRUCT = "mistral-instruct"
    ALPACA = "alpaca"
    PHI3 = "phi3"
    GEMMA = "gemma"
    ZEPHYR = "zephyr"

    @classmethod
    def parse(cls, s: str) -> "TemplateType":
        s = s.strip().lower().replace("_", "-")
        for t in cls:
            if t.value == s:
                return t
        raise ValueError(
            f"unknown template {s!r}; options: {[t.value for t in cls]}"
        )


@dataclass(frozen=True)
class Message:
    role: str  # 'system' | 'user' | 'assistant'
    content: str


@dataclass(frozen=True)
class TemplateSpec:
    """Rendering rules + stop/BOS policy (lib.rs:1948-2124)."""

    type: TemplateType
    stop_sequences: tuple[str, ...] = ()
    add_bos: bool = True


SPECS: dict[TemplateType, TemplateSpec] = {
    TemplateType.RAW: TemplateSpec(TemplateType.RAW),
    TemplateType.INSTRUCT: TemplateSpec(
        TemplateType.INSTRUCT, stop_sequences=("### Instruction:",)),
    TemplateType.LLAMA3_CHAT: TemplateSpec(
        TemplateType.LLAMA3_CHAT,
        stop_sequences=("<|eot_id|>",),
        add_bos=False,  # template embeds <|begin_of_text|>
    ),
    TemplateType.CHATML: TemplateSpec(
        TemplateType.CHATML, stop_sequences=("<|im_end|>",)),
    TemplateType.MISTRAL_INSTRUCT: TemplateSpec(
        TemplateType.MISTRAL_INSTRUCT, stop_sequences=("[INST]",)),
    TemplateType.ALPACA: TemplateSpec(
        TemplateType.ALPACA, stop_sequences=("### Instruction:",)),
    TemplateType.PHI3: TemplateSpec(
        TemplateType.PHI3, stop_sequences=("<|end|>", "<|user|>")),
    TemplateType.GEMMA: TemplateSpec(
        TemplateType.GEMMA, stop_sequences=("<end_of_turn>",)),
    TemplateType.ZEPHYR: TemplateSpec(
        TemplateType.ZEPHYR, stop_sequences=("</s>", "<|user|>")),
}


# --------------------------------------------------------------------------
# Detection (lib.rs:362: GGUF metadata → tokenizer name → jinja heuristics)
# --------------------------------------------------------------------------
def detect(metadata: dict | None = None, model_name: str = "") -> TemplateType:
    md = metadata or {}
    jinja = md.get("tokenizer.chat_template", "") or ""
    name = (md.get("general.name", "") or model_name or "").lower()

    if "<|start_header_id|>" in jinja or "<|eot_id|>" in jinja:
        return TemplateType.LLAMA3_CHAT
    if "<|im_start|>" in jinja:
        return TemplateType.CHATML
    if "[INST]" in jinja:
        return TemplateType.MISTRAL_INSTRUCT
    if "<start_of_turn>" in jinja:
        return TemplateType.GEMMA
    if "<|end|>" in jinja and "<|assistant|>" in jinja:
        return TemplateType.PHI3
    if "<|assistant|>" in jinja and "</s>" in jinja:
        return TemplateType.ZEPHYR
    if "llama-3" in name or "llama3" in name:
        return TemplateType.LLAMA3_CHAT
    if "phi-3" in name or "phi3" in name:
        return TemplateType.PHI3
    if "gemma" in name:
        return TemplateType.GEMMA
    if "zephyr" in name:
        return TemplateType.ZEPHYR
    if "qwen" in name:
        return TemplateType.CHATML
    if "bitnet" in name and "instruct" not in name and not jinja:
        # base BitNet checkpoints (e.g. b1.58-2B-4T) ship llama3-style chat
        return TemplateType.LLAMA3_CHAT
    if "mistral" in name:
        return TemplateType.MISTRAL_INSTRUCT
    if "instruct" in name or "chat" in name:
        return TemplateType.INSTRUCT
    return TemplateType.RAW


# --------------------------------------------------------------------------
# Rendering
# --------------------------------------------------------------------------
def render_chat(
    template: TemplateType,
    messages: list[Message],
    add_generation_prompt: bool = True,
) -> str:
    """Multi-turn rendering (lib.rs:1122/2240)."""
    if template == TemplateType.RAW:
        return "\n".join(m.content for m in messages)

    if template == TemplateType.LLAMA3_CHAT:
        out = ["<|begin_of_text|>"]
        for m in messages:
            out.append(
                f"<|start_header_id|>{m.role}<|end_header_id|>\n\n"
                f"{m.content}<|eot_id|>"
            )
        if add_generation_prompt:
            out.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
        return "".join(out)

    if template == TemplateType.CHATML:
        out = []
        for m in messages:
            out.append(f"<|im_start|>{m.role}\n{m.content}<|im_end|>\n")
        if add_generation_prompt:
            out.append("<|im_start|>assistant\n")
        return "".join(out)

    if template == TemplateType.MISTRAL_INSTRUCT:
        out = []
        system = ""
        for m in messages:
            if m.role == "system":
                system = m.content + "\n\n"
            elif m.role == "user":
                out.append(f"[INST] {system}{m.content} [/INST]")
                system = ""
            else:
                out.append(f" {m.content}</s>")
        return "".join(out)

    if template == TemplateType.PHI3:
        out = []
        for m in messages:
            out.append(f"<|{m.role}|>\n{m.content}<|end|>\n")
        if add_generation_prompt:
            out.append("<|assistant|>\n")
        return "".join(out)

    if template == TemplateType.GEMMA:
        # gemma has no system role: a system prompt prefixes the first
        # user turn; the assistant role is called "model"
        out = []
        system = ""
        for m in messages:
            if m.role == "system":
                system = m.content + "\n\n"
            elif m.role == "user":
                out.append(f"<start_of_turn>user\n{system}{m.content}"
                           f"<end_of_turn>\n")
                system = ""
            else:
                out.append(f"<start_of_turn>model\n{m.content}"
                           f"<end_of_turn>\n")
        if add_generation_prompt:
            out.append("<start_of_turn>model\n")
        return "".join(out)

    if template == TemplateType.ZEPHYR:
        out = []
        for m in messages:
            out.append(f"<|{m.role}|>\n{m.content}</s>\n")
        if add_generation_prompt:
            out.append("<|assistant|>\n")
        return "".join(out)

    if template == TemplateType.ALPACA:
        out = []
        for m in messages:
            if m.role == "system":
                out.append(m.content + "\n\n")
            elif m.role == "user":
                out.append(f"### Instruction:\n{m.content}\n\n")
            else:
                out.append(f"### Response:\n{m.content}\n\n")
        if add_generation_prompt:
            out.append("### Response:\n")
        return "".join(out)

    # INSTRUCT (generic)
    out = []
    for m in messages:
        if m.role == "system":
            out.append(f"System: {m.content}\n")
        elif m.role == "user":
            out.append(f"User: {m.content}\n")
        else:
            out.append(f"Assistant: {m.content}\n")
    if add_generation_prompt:
        out.append("Assistant: ")
    return "".join(out)


def apply(
    template: TemplateType,
    prompt: str,
    system_prompt: str | None = None,
) -> str:
    """Single-prompt application (lib.rs:1122 ``apply``)."""
    msgs = []
    if system_prompt:
        msgs.append(Message("system", system_prompt))
    msgs.append(Message("user", prompt))
    if template == TemplateType.RAW:
        return prompt if not system_prompt else f"{system_prompt}\n{prompt}"
    return render_chat(template, msgs)


def validate_output(template: TemplateType, text: str) -> list[str]:
    """Post-generation output validation (reference lib.rs:3103): flag
    template-token leakage — control markers that should have been
    consumed as stop sequences appearing in user-visible text."""
    leak_markers = {
        TemplateType.LLAMA3_CHAT: ["<|eot_id|>", "<|start_header_id|>",
                                   "<|end_header_id|>"],
        TemplateType.CHATML: ["<|im_start|>", "<|im_end|>"],
        TemplateType.INSTRUCT: ["### Instruction:", "### Response:"],
        TemplateType.MISTRAL_INSTRUCT: ["[INST]", "[/INST]"],
        TemplateType.ALPACA: ["### Instruction:", "### Input:"],
        TemplateType.PHI3: ["<|end|>", "<|user|>", "<|assistant|>"],
        TemplateType.GEMMA: ["<start_of_turn>", "<end_of_turn>"],
        TemplateType.ZEPHYR: ["<|user|>", "<|assistant|>"],
    }.get(template, [])
    problems = [f"template marker leaked into output: {m!r}"
                for m in leak_markers if m in text]
    for ch in ("￾", "￿"):
        if ch in text:
            problems.append(f"invalid unicode {ch!r} in output")
    return problems


def spec_for(template: TemplateType) -> TemplateSpec:
    return SPECS[template]


__all__ = [
    "TemplateType",
    "Message",
    "TemplateSpec",
    "detect",
    "render_chat",
    "apply",
    "spec_for",
]
