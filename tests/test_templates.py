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
