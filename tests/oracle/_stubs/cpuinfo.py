def get_cpu_info():
    return {'brand_raw': 'stub', 'arch_string_raw': 'x86_64',
            'count': 8, 'flags': []}
