from vaura_tpu.utils.seeding import seed_everything

__all__ = ["seed_everything"]
