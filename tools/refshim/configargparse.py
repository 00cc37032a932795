"""configargparse shim: plain argparse."""
from argparse import *  # noqa
import argparse


class ArgumentParser(argparse.ArgumentParser):
    def __init__(self, *a, **kw):
        kw.pop("default_config_files", None)
        kw.pop("config_file_parser_class", None)
        kw.pop("add_config_file_help", None)
        kw.pop("args_for_setting_config_path", None)
        super().__init__(*a, **kw)

    def add_argument(self, *a, **kw):
        kw.pop("is_config_file", None)
        kw.pop("env_var", None)
        return super().add_argument(*a, **kw)


YAMLConfigFileParser = object
