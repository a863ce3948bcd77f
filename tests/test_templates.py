"""Prompt template tests (reference: bitnet-prompt-templates inline tests)."""

import pytest

from bitnet_tpu import templates as T


class TestDetect:
    def test_llama3_from_jinja(self):
        md = {"tokenizer.chat_template": "{{ '<|start_header_id|>' }}..."}
        assert T.detect(md) == T.TemplateType.LLAMA3_CHAT

    def test_chatml_from_jinja(self):
        md = {"tokenizer.chat_template": "<|im_start|>system..."}
        assert T.detect(md) == T.TemplateType.CHATML

    def test_mistral_from_jinja(self):
        md = {"tokenizer.chat_template": "[INST] {{prompt}} [/INST]"}
        assert T.detect(md) == T.TemplateType.MISTRAL_INSTRUCT

    def test_from_name(self):
        assert T.detect({"general.name": "Llama-3-8B"}) == \
            T.TemplateType.LLAMA3_CHAT
        assert T.detect({"general.name": "foo-instruct"}) == \
            T.TemplateType.INSTRUCT

    def test_default_raw(self):
        assert T.detect({"general.name": "random-model"}) == T.TemplateType.RAW

    def test_parse(self):
        assert T.TemplateType.parse("llama3-chat") == T.TemplateType.LLAMA3_CHAT
        with pytest.raises(ValueError):
            T.TemplateType.parse("nope")


class TestRender:
    def test_raw_passthrough(self):
        assert T.apply(T.TemplateType.RAW, "hi") == "hi"

    def test_llama3_structure(self):
        out = T.apply(T.TemplateType.LLAMA3_CHAT, "hi", "be nice")
        assert out.startswith("<|begin_of_text|>")
        assert "<|start_header_id|>system<|end_header_id|>\n\nbe nice<|eot_id|>" in out
        assert "<|start_header_id|>user<|end_header_id|>\n\nhi<|eot_id|>" in out
        assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")

    def test_chatml_structure(self):
        out = T.apply(T.TemplateType.CHATML, "hi")
        assert "<|im_start|>user\nhi<|im_end|>" in out
        assert out.endswith("<|im_start|>assistant\n")

    def test_multiturn_chat(self):
        msgs = [T.Message("user", "a"), T.Message("assistant", "b"),
                T.Message("user", "c")]
        out = T.render_chat(T.TemplateType.CHATML, msgs)
        assert out.index("a") < out.index("b") < out.index("c")

    def test_mistral(self):
        out = T.apply(T.TemplateType.MISTRAL_INSTRUCT, "q", "sys")
        assert out == "[INST] sys\n\nq [/INST]"

    def test_stop_sequences_exposed(self):
        spec = T.spec_for(T.TemplateType.LLAMA3_CHAT)
        assert "<|eot_id|>" in spec.stop_sequences
        assert spec.add_bos is False


class TestOutputValidation:
    def test_leak_detected(self):
        from bitnet_tpu.templates import TemplateType, validate_output

        probs = validate_output(TemplateType.CHATML,
                                "hi there <|im_end|> leftover")
        assert probs and "im_end" in probs[0]

    def test_clean_output(self):
        from bitnet_tpu.templates import TemplateType, validate_output

        assert validate_output(TemplateType.CHATML, "clean answer") == []

    def test_raw_never_flags(self):
        from bitnet_tpu.templates import TemplateType, validate_output

        assert validate_output(TemplateType.RAW, "[INST] ok") == []


class TestExtendedTemplates:
    """Round-2 template additions (phi3 / gemma / zephyr) — detection,
    rendering, stop sequences, leak markers."""

    def test_phi3_render_and_detect(self):
        from bitnet_tpu import templates as T

        msgs = [T.Message("system", "be brief"),
                T.Message("user", "hi")]
        out = T.render_chat(T.TemplateType.PHI3, msgs)
        assert out == ("<|system|>\nbe brief<|end|>\n"
                       "<|user|>\nhi<|end|>\n<|assistant|>\n")
        jinja = "{{'<|user|>'}}...{{'<|end|>'}}<|assistant|>"
        assert T.detect({"tokenizer.chat_template": jinja}) == \
            T.TemplateType.PHI3
        assert T.detect({}, "microsoft/Phi-3-mini") == T.TemplateType.PHI3
        assert "<|end|>" in T.spec_for(T.TemplateType.PHI3).stop_sequences

    def test_gemma_render_and_detect(self):
        from bitnet_tpu import templates as T

        msgs = [T.Message("system", "sys"), T.Message("user", "q"),
                T.Message("assistant", "a"), T.Message("user", "q2")]
        out = T.render_chat(T.TemplateType.GEMMA, msgs)
        # no system role: prefixed into the first user turn
        assert out.startswith("<start_of_turn>user\nsys\n\nq<end_of_turn>")
        assert "<start_of_turn>model\na<end_of_turn>" in out
        assert out.endswith("<start_of_turn>model\n")
        assert T.detect({"tokenizer.chat_template":
                         "...<start_of_turn>..."}) == T.TemplateType.GEMMA
        assert T.detect({}, "google/gemma-2b") == T.TemplateType.GEMMA

    def test_zephyr_render_and_detect(self):
        from bitnet_tpu import templates as T

        out = T.render_chat(T.TemplateType.ZEPHYR,
                            [T.Message("user", "x")])
        assert out == "<|user|>\nx</s>\n<|assistant|>\n"
        assert T.detect({}, "HuggingFaceH4/zephyr-7b") == \
            T.TemplateType.ZEPHYR

    def test_qwen_maps_to_chatml(self):
        from bitnet_tpu import templates as T

        assert T.detect({}, "Qwen/Qwen2-7B") == T.TemplateType.CHATML

    def test_leak_markers(self):
        from bitnet_tpu import templates as T

        assert T.validate_output(T.TemplateType.GEMMA,
                                 "hi <end_of_turn> there")
        assert not T.validate_output(T.TemplateType.GEMMA, "clean")

    def test_parse_all_values(self):
        from bitnet_tpu import templates as T

        for t in T.TemplateType:
            assert T.TemplateType.parse(t.value) is t
